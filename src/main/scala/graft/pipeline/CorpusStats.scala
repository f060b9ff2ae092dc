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
    * requested percentile.
    *
    * "Bounded by distinct values" is only a bound when the domain IS
    * discrete: a continuous double column has ~N distinct values and the
    * histogram window degenerates into a full-corpus single-task funnel.
    * The operator refuses loudly above `maxDistinct` (measured on the
    * already-materialized histogram, no extra pass) rather than silently
    * running the at-scale bottleneck — round/bucket the value column
    * first (exact percentiles of the coarsened value) or use Spark's
    * `percentile_approx` for genuinely continuous domains. */
  def exactPercentiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      checkpointHist: Boolean = true, maxDistinct: Long = 1000000L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"percentiles $ps must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val hist0 = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val hist = if (checkpointHist) hist0.localCheckpoint() else hist0
    val stats = hist.agg(coalesce(sum("c"), lit(0L)), count(lit(1))).head()
    val n = stats.getLong(0)
    val distinct = stats.getLong(1)
    require(n > 0, "exactPercentiles: empty input")
    require(distinct <= maxDistinct,
      s"exactPercentiles: $valueCol has $distinct distinct values (> " +
        s"maxDistinct=$maxDistinct) — the cumulative-sum window would funnel " +
        "the full histogram through one task. Bucket/round the column first " +
        "or use percentile_approx for continuous domains.")
    // single-partition window over the HISTOGRAM only (bounded by the
    // number of distinct values, not by N)
    val cum = hist.withColumn("cum", sum("c").over(
      Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val targets = ps.toDF("p").withColumn("k", ceil(col("p") * n))
    targets.join(cum, col("cum") >= col("k"))
      .groupBy("p").agg(min("v").as("value"))
  }
}
