package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text lexical retrieval over the corpus — BM25 top-k, the ranking
  * function behind retrieval-based decontamination sweeps, dataset
  * curation ("find the training docs closest to this eval prompt"), and
  * RAG candidate generation (beyond-reference surface: the reference has
  * no lexical search operator).
  *
  * Scale posture: the corpus is never paired with the query set. One
  * narrow scan explodes documents into (doc, term) occurrences which are
  * immediately broadcast-semi-joined against the DISTINCT query terms —
  * so the only shuffle carries query-term occurrences (corpus frequency
  * of the query vocabulary, not the corpus). Document frequencies and
  * corpus stats (N, total length) are tiny aggregates of that filtered
  * stream; the final ranking windows partition by query, so per-query
  * work is bounded by that query's posting volume.
  */
object Retrieval {

  /** BM25 top-k (Robertson/Okapi, the Lucene `k1`/`b` parameterisation
    * with the non-negative `ln(1 + (N-df+0.5)/(df+0.5))` idf).
    *
    * Scores are returned as integer micro-units (`score_micro` =
    * Σ_terms floor(contribution · 10⁶)): per-term quantisation before the
    * sum makes the total independent of float-summation order — the same
    * value on any partitioning, and bit-identical in the DuckDB oracle.
    *
    * `queries` carries (`queryIdCol`, `queryTextCol`); query text is
    * tokenised exactly like documents and deduplicated per query
    * (BM25 is defined over distinct query terms).
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "qtext"): DataFrame = {
    require(k >= 1, s"bm25TopK k $k must be >= 1")
    val toks = TextAnalysis.tokens(trim(col(textCol)))
    // (doc, dl, term) occurrences; dl rides along so the scoring join
    // needs no second corpus pass
    val occ = docs.select(col(idCol).as("doc_id"), size(toks).as("dl"),
      explode(toks).as("term"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(TextAnalysis.tokens(trim(col(queryTextCol))))).as("term"))
    val qvocab = qterms.select("term").distinct()
    // the early broadcast filter: only query-vocabulary occurrences
    // survive to the (doc, term) aggregation
    val matched = occ.join(broadcast(qvocab), Seq("term"), "left_semi")
    val postings = matched.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    // df over matched postings only (it counts docs per QUERY term);
    // corpus stats come from the unfiltered doc-length projection, as
    // exact integers so avgdl = sum/n is one exactly-rounded division
    val df = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.select(size(toks).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val scoredTerms = postings
      .join(broadcast(df), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sumdl").cast("double") / col("n").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib_micro", floor(
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
          * lit(1000000.0)))
    val scored = scoredTerms.groupBy("query_id", "doc_id")
      .agg(sum("contrib_micro").as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score_micro", "rank")
  }
}
