package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MetadataBuilder}

/** Mergeable frequency sketches over keyed columns (beyond-reference:
  * the corpus-profiling counterpart of [[graft.functions.KmvDistinct]]'s
  * distinct-count sketch).
  *
  * The count-min sketch here is built as a DataFrame aggregation rather
  * than a custom aggregate: the sketch IS a d×w counter table, and a
  * `groupBy(depth, bucket).sum` produces exactly that table through one
  * partial-aggregated shuffle of at most d·w rows per partition —
  * already mergeable, spillable, and AQE-planned. Every counter is an
  * integer sum over md5-derived buckets, so the whole sketch (and any
  * estimate read from it) is bit-identical across engines and row
  * orders — hash-checkable, unlike float-accumulator sketches.
  */
object Sketches {

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over `keyCol`:
    * one row per non-empty counter, (depth, bucket, cnt), where
    * bucket = md5₆₀("cms" + depth + key) mod w. Point-query guarantee:
    * for any key, min over depths of its counters overestimates the true
    * count by at most n/w in expectation per depth (Markov), and the min
    * over d independent depths makes a large overestimate exponentially
    * unlikely. Output is at most d·w rows regardless of input size. */
  def countMin(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 1, s"countMin d=$d, w=$w must be >= 1")
    // the build parameters ride on the depth column's metadata (survives
    // parquet round-trips) so a mismatched estimate read fails loudly
    // instead of silently understating (ADVICE r6) — values unchanged
    val params = new MetadataBuilder().putLong("cms_d", d).putLong("cms_w", w).build()
    df.select(col(keyCol).as("__k"))
      .filter(col("__k").isNotNull) // a null key has no frequency to count
      .select(explode(depthBuckets(d, w)).as("db"))
      .select(col("db.depth").as("depth"), col("db.bucket").as("bucket"))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("depth", col("depth").as("depth", params))
  }

  /** (depth, bucket) pairs for the current row's `__k`, one per depth. */
  private def depthBuckets(d: Int, w: Int) =
    transform(sequence(lit(0), lit(d - 1)), j => struct(
      j.cast(IntegerType).as("depth"),
      pmod(Dedup.md5Hash60(concat(lit("cms"), j.cast("string"),
        col("__k").cast("string"))), lit(w.toLong)).cast(IntegerType).as("bucket")))

  /** Point estimates for `keys` against a built sketch: the classic
    * min-over-depths counter read. Keys never seen estimate 0 only if
    * ALL their buckets are empty (count-min never underestimates).
    * The SKETCH side broadcasts — it is at most d·w rows by
    * construction, and a broadcast hint must sit on the BUILD (right)
    * side of the left_outer join to be satisfiable — so arbitrarily
    * large key sets stream narrowly against the broadcast counters. */
  def countMinEstimate(cms: DataFrame, keys: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    // a sketch built by countMin carries its (d, w) in column metadata;
    // reading it with different parameters coalesces missing buckets to
    // 0 under the min — a silent understatement, so refuse loudly.
    // Sketches from other producers (no metadata) stay caller-checked.
    cms.schema.find(_.name == "depth").map(_.metadata).foreach { m =>
      if (m.contains("cms_d"))
        require(m.getLong("cms_d") == d && m.getLong("cms_w") == w,
          s"countMinEstimate(d=$d, w=$w) against a sketch built with " +
            s"d=${m.getLong("cms_d")}, w=${m.getLong("cms_w")}")
    }
    val kq = keys.select(col(keyCol).as("__k")).filter(col("__k").isNotNull).distinct()
      .select(col("__k"), explode(depthBuckets(d, w)).as("db"))
      .select(col("__k"), col("db.depth").as("depth"), col("db.bucket").as("bucket"))
    kq.join(broadcast(cms), Seq("depth", "bucket"), "left_outer")
      .groupBy(col("__k").as(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
