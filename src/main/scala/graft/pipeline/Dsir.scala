package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by how much more likely its hashed n-gram features are under a TARGET
  * corpus (the distribution you want more of — quality text, a domain)
  * than under the RAW corpus it came from, then keep the top slice.
  *
  * Features are hashed n-grams: each gram maps to one of `buckets`
  * buckets via the engine-portable md5-60 hash ([[Dedup.md5Hash60]], so
  * DuckDB reproduces the weights bit-for-bit), and each side fits a
  * bag-of-buckets unigram model with add-one smoothing. A document's log
  * importance weight is Σ over its grams of
  * `log p_target(bucket) − log p_raw(bucket)`.
  *
  * Scale shape (the point of the hashing): both models aggregate to at
  * most `buckets` rows regardless of corpus size — one gram-keyed
  * shuffle with map-side combine per side, the bucket ratio table
  * broadcast back, one doc-keyed aggregation for the scores. No driver
  * loop, no unbounded vocabulary.
  */
object Dsir {

  /** (id, bucket) — one row per gram occurrence. The token array is
    * pre-projected into its own column BEFORE the gram transform (the
    * [[TextAnalysis.ngramsOfTokens]] discipline: a lambda capturing the
    * split() expression re-runs the regex per gram — measured 2× on this
    * operator's first cut). */
  def docBuckets(docs: DataFrame, n: Int, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1 && buckets > 0, s"n=$n, buckets=$buckets must be positive")
    docs
      .select(col(idCol),
        TextAnalysis.tokens(trim(lower(col(textCol)))).as("__toks"))
      .select(col(idCol),
        explode(TextAnalysis.ngramsOfTokens(col("__toks"), n)).as("gram"))
      .select(col(idCol), bucketOf(col("gram"), buckets).as("bucket"))
  }

  /** (bucket, cnt) hashed-gram counts over a corpus side. */
  def hashedBucketCounts(docs: DataFrame, n: Int, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docBuckets(docs, n, buckets, idCol, textCol)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document log importance weight of `raw` against `target`:
    * (idCol, n_grams, logw) — logw rounded to 6 decimals for the
    * engine-portable compare; documents with no grams score 0.0.
    * Resampling policy (top-k, Gumbel, threshold) is the caller's —
    * deterministic scoring is the distributed part. */
  def logImportanceWeights(raw: DataFrame, target: DataFrame, n: Int = 2,
      buckets: Int = 10000, idCol: String = "doc_id",
      textCol: String = "text", checkpointBuckets: Boolean = true): DataFrame = {
    // the raw side feeds BOTH the model fit (an eager totals collect) and
    // the scoring join — checkpoint the (id, bucket) rows so the corpus
    // tokenize+md5 pass runs once, not once per action (13.9 s → ~3 s at
    // sf0.1; opt out for composability into a larger lazy plan)
    val db0 = docBuckets(raw, n, buckets, idCol, textCol)
    val db = if (checkpointBuckets) db0.localCheckpoint() else db0
    val rawC = db.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val tgt = hashedBucketCounts(target, n, buckets, textCol, idCol)
    // totals are single rows over ≤`buckets`-row aggregates — collect and
    // inline (same discipline as LanguageModel.scoreNll)
    def totalOf(c: DataFrame): Double =
      c.agg(coalesce(sum("cnt"), lit(0L)).cast("double")).head().getDouble(0)
    val (nT, nR) = (totalOf(tgt), totalOf(rawC))
    require(nT > 0, "logImportanceWeights: target corpus has no grams")
    require(nR > 0, "logImportanceWeights: raw corpus has no grams")
    // add-one smoothed log ratio per bucket; buckets unseen on a side
    // cost log(1 / (N + buckets)) there — expressed via coalesce so the
    // ratio table stays |present buckets| rows, not `buckets`
    val ratios = tgt.withColumnRenamed("cnt", "__ct")
      .join(rawC.withColumnRenamed("cnt", "__cr"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        ((log(coalesce(col("__ct"), lit(0L)).cast("double") + 1.0) -
          log(lit(nT + buckets))) -
         (log(coalesce(col("__cr"), lit(0L)).cast("double") + 1.0) -
          log(lit(nR + buckets)))).as("__ratio"))
    val defaultRatio = math.log(1.0 / (nT + buckets)) - math.log(1.0 / (nR + buckets))
    val scored = db
      .join(broadcast(ratios), Seq("bucket"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        round(sum(coalesce(col("__ratio"), lit(defaultRatio))), 6).as("logw"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** Deterministic top-fraction selection by (logw desc, id asc). A bare
    * `row_number() OVER (ORDER BY …)` would funnel every score through
    * one partition; this is the same two-pass distributed rank as
    * [[Sampling.tokenShards]] — range-partition on the sort key,
    * per-partition ranks in parallel, one #partitions-row offset table
    * broadcast back — so the global rank costs one range shuffle of
    * (id, logw) pairs. */
  def selectTopFraction(weights: DataFrame, fraction: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val n = weights.count()
    val k = math.max(1L, math.ceil(n * fraction).toLong)
    val t = weights
      .repartitionByRange(col("logw").desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
    val offsets = t.groupBy("__pid").agg(count(lit(1)).as("__pc"))
      .withColumn("__off", coalesce(sum("__pc").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val localRank = row_number().over(
      Window.partitionBy("__pid").orderBy(col("logw").desc, col(idCol).asc))
    t.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__rank", localRank.cast("long") + col("__off"))
      .filter(col("__rank") <= k)
      .drop("__pid", "__off", "__rank")
  }

  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(Dedup.md5Hash60(gram), lit(buckets.toLong))
}
