package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact corpus statistics at scale. Spark's own `percentile_approx` is
  * approximate by design; a training-data pipeline reporting corpus
  * length distributions wants EXACT quantiles without a global sort.
  * Beyond-reference surface (SURVEY §7.1.8).
  */
object CorpusStats {

  /** Exact nearest-rank percentiles of `valueCol` (lowest value whose
    * cumulative count reaches ⌈p·N⌉). The column keeps its own type —
    * no silent integer truncation; fractional value columns get their
    * genuine exact percentiles.
    *
    * Scale shape: the corpus aggregates ONCE to a VALUE HISTOGRAM (one
    * shuffle with map-side combine, ≤ distinct-value rows — for token
    * counts, thousands of rows regardless of corpus size), which is
    * checkpointed so N (its count sum) and the running sum both read the
    * compact table instead of re-scanning the corpus. The running sum's
    * single-partition window runs over the histogram only, the same
    * bounded-side discipline as [[Sampling.tokenShards]]'s offset table.
    * No global sort of N rows, no approximation. Returns (p, value) per
    * requested percentile. */
  def exactPercentiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      checkpointHist: Boolean = true): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"percentiles $ps must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val hist0 = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val hist = if (checkpointHist) hist0.localCheckpoint() else hist0
    val n = hist.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    require(n > 0, "exactPercentiles: empty input")
    // single-partition window over the HISTOGRAM only (bounded by the
    // number of distinct values, not by N)
    val cum = hist.withColumn("cum", sum("c").over(
      Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val targets = ps.toDF("p").withColumn("k", ceil(col("p") * n))
    targets.join(cum, col("cum") >= col("k"))
      .groupBy("p").agg(min("v").as("value"))
  }
}
