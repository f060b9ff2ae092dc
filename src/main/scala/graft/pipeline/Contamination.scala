package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the n-gram-overlap decontamination
  * pass LLM training pipelines run before training: held-out benchmark
  * items must not appear in the training corpus (the standard corpus-scale
  * configuration is 13-gram overlap; the oracle entry uses 3-grams so the
  * synthetic word-soup corpus is non-vacuous).
  *
  * Scale posture: candidate generation is an inverted-index equi-join on
  * the n-gram string — never an n×m document pairing — so 100 TB of
  * training text joins against a benchmark set through one shuffle keyed
  * by gram, exactly like the [[Dedup]] blocking joins. `maxDf` drops grams
  * appearing in more than that many training documents: stopword-soup
  * grams contribute no contamination evidence but dominate the join
  * fanout (the same hot-key cap as `Dedup.ngramJaccard`'s `maxDf`).
  */
object Contamination {

  /** Distinct word n-grams per row, exploded to (id, gram). The token
    * array is pre-projected into its own column so the gram lambda reads
    * an attribute instead of re-evaluating the tokenizing `split()` per
    * element ([[TextAnalysis.ngramsOfTokens]]). */
  private def gramRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
        TextAnalysis.tokens(trim(col(textCol))).as("__toks"))
      .select(col(idCol), explode(array_distinct(
        TextAnalysis.ngramsOfTokens(col("__toks"), n))).as("gram"))

  /** Pairs `(docId, benchId, shared)` where a training document shares at
    * least `minShared` DISTINCT word n-grams with a benchmark item.
    * Self-pairs are excluded (a benchmark set drawn from the corpus
    * itself must not flag its own source rows). The `maxDf` cap is
    * computed over the TRAINING side; benchmark grams only ever join
    * against surviving training grams, so capping one side caps the join. */
  /** `checkpointGrams`: the df-cap references the training gram table
    * twice (keep-list aggregation + the capped join); by default both
    * subplans re-run the explode — lazy for composability, like
    * `Dedup.checkpointSigs`. True materializes the gram table once.
    * Measured at sf0.1 (Bench harness, n=3 median): 8.2 s single-split
    * lazy → 2.6 s with entry-side repartition + checkpoint + the
    * pre-tokenized gram lambda; the driver entry passes true. */
  def contaminatedPairs(docs: DataFrame, bench: DataFrame, n: Int = 13,
      minShared: Int = 1, maxDf: Option[Int] = Some(1000),
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "bench_id", checkpointGrams: Boolean = false): DataFrame = {
    val d00 = gramRows(docs, idCol, textCol, n)
    val d0 = if (checkpointGrams && maxDf.isDefined) d00.localCheckpoint() else d00
    val d = maxDf match {
      case Some(cap) =>
        val keep = d0.groupBy("gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("gram")
        d0.join(keep, Seq("gram"), "inner")
      case None => d0
    }
    val b = gramRows(bench, idCol, textCol, n).withColumnRenamed(idCol, benchIdCol)
    d.join(b, Seq("gram"), "inner")
      .filter(col(idCol) =!= col(benchIdCol))
      .groupBy(idCol, benchIdCol)
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
