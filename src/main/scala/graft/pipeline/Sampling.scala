package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and split assignment for
  * training-data pipelines (beyond-reference surface, SURVEY §7.1.8):
  * the standard way to carve a 100 TB corpus into reproducible samples
  * and train/validation/test splits WITHOUT a global shuffle or a
  * random() that changes between runs — every decision is a pure
  * function of the row's key, so reruns, backfills, and incremental
  * appends land each document in the same bucket forever.
  *
  * Hashing is [[Dedup.md5Hash60]] (md5 → 60-bit int) rather than
  * xxhash64 so the assignment is engine-portable — DuckDB reproduces it
  * closed-form, which keeps these operators hash-checkable end-to-end.
  * Narrow transformations only: no shuffle, no driver state.
  */
object Sampling {

  /** Stable per-key bucket in [0, buckets). A salt namespaces
    * independent decisions (sampling vs splitting) off one key. */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(Dedup.md5Hash60(concat(lit(salt), key.cast("string"))), lit(buckets.toLong))

  /** Keep a deterministic `percent`% of rows by key. */
  def deterministicSample(df: DataFrame, keyCol: String, percent: Int,
      salt: String = "sample"): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.filter(hashBucket(col(keyCol), 100, salt) < percent)
  }

  /** Assign train/validation/test splits by key hash: bucket < trainPct →
    * train, < trainPct+valPct → validation, else test. */
  def splitAssign(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10, salt: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = hashBucket(col(keyCol), 100, salt)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("validation"))
        .otherwise(lit("test")))
  }

  /** Token-budget sharding: assign each document (in ascending `idCol`
    * order) to the shard holding its cumulative token count —
    * `shard = floor(tokens-before-this-doc / budget)` — the standard way
    * a pretraining pipeline carves a corpus into fixed-token-budget
    * output files with stable, reproducible boundaries.
    *
    * A global running sum is the textbook sequential trap; this is the
    * two-pass distributed prefix sum: range-partition by id (so partition
    * order is id order), per-partition exclusive running sums in
    * parallel, then ONE tiny aggregation (a row per partition) windowed
    * on the driver-sized side and broadcast back as offsets. At 100 TB
    * the only non-parallel step remains O(#partitions), not O(#docs).
    * (Catalyst re-hashes on __pid for the per-partition window — a second
    * exchange — but both shuffles move only (id, count) pairs, never
    * document text.) */
  def tokenShards(docs: DataFrame, budget: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val t = docs
      .select(col(idCol), TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"))
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
    // per-partition totals: #partitions rows — the single-partition window
    // below runs over THAT, not the corpus
    val offsets = t.groupBy("__pid").agg(sum("__n").as("__psum"))
      .withColumn("__off", coalesce(sum("__psum").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val localCum = sum("__n").over(
      Window.partitionBy("__pid").orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1))
    t.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__cum", coalesce(localCum, lit(0L)) + col("__off"))
      .select(col(idCol), col("__n").as("n_tokens"),
        floor(col("__cum") / budget).as("shard"))
  }

  /** Domain-mixing sampler: keep a different deterministic percentage per
    * group (the per-source mixture weights every corpus recipe specifies —
    * e.g. C4 at 20%, code at 100%). Groups absent from `percents` get
    * `defaultPercent`. Still one narrow filter — the per-group rate just
    * selects the threshold the row's hash bucket is compared against; no
    * shuffle, no per-group pass. */
  def weightedSample(df: DataFrame, keyCol: String, groupCol: String,
      percents: Map[String, Int], defaultPercent: Int = 100,
      salt: String = "mix"): DataFrame = {
    require((defaultPercent +: percents.values.toSeq).forall(p => p >= 0 && p <= 100),
      "percents must be in [0, 100]")
    val threshold = percents.foldLeft(lit(defaultPercent)) {
      case (acc, (g, p)) => when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100, salt) < threshold)
  }

  /** Temperature-based source mixing — the standard multi-corpus
    * reweighting (multinomial sampling with p_src ∝ n_src^α, α ∈ (0, 1]):
    * per-document keep rate (n_src / n_min)^(α−1), so the SMALLEST source
    * keeps 100 % and larger sources are downsampled toward balance; α = 1
    * keeps everything (proportional mixing), α → 0 approaches uniform
    * source shares. Decision stays a pure function of the document key
    * (engine-portable md5 hash vs the rate), so reruns and incremental
    * appends keep every document's fate stable. Cost: one tiny
    * per-source count aggregate broadcast back — no global shuffle of
    * the corpus itself. */
  def temperatureMix(df: DataFrame, keyCol: String, srcCol: String,
      alpha: Double, salt: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha must be in (0, 1]")
    val counts = df.groupBy(srcCol).agg(count(lit(1)).cast("double").as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__minN"))))
      .select(col(srcCol), pow(col("__n") / col("__minN"), alpha - 1).as("__rate"))
    df.join(broadcast(rates), srcCol)
      .filter(md5Hash60OfKey(col(keyCol), salt).cast("double") <
        col("__rate") * lit(1152921504606846976.0)) // 2^60
      .drop("__rate")
  }

  private def md5Hash60OfKey(key: Column, salt: String): Column =
    Dedup.md5Hash60(concat(lit(salt), key.cast("string")))
}
