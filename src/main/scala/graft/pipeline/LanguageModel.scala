package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the CCNet-style
  * "perplexity filter" stage of an LLM training-data pipeline (Wenzek et
  * al. 2020 train a small LM on trusted text and drop corpus documents
  * whose perplexity is an outlier; the same shape powers quality bucketing
  * in most public corpus recipes).
  *
  * Beyond-reference surface (SURVEY §7.1.8 family). Deterministic
  * arithmetic only — token counts plus add-one smoothing — so the DuckDB
  * oracle reproduces the scores bit-for-bit after `round(…, 6)`.
  *
  * Scale posture (100 TB corpus):
  *  - [[train]] is one shuffle keyed by gram with map-side partial
  *    aggregation — the classic word-count; hot tokens (stopwords) are
  *    exactly the keys partial aggregation collapses before the exchange.
  *  - [[scoreNll]] joins per-token rows against the model. The model is
  *    vocabulary-sized — tens of MB even for web-scale corpora — so the
  *    default is a broadcast join (no shuffle, no skew: the hot-token
  *    fanout never crosses the wire); `broadcastLm = false` falls back to
  *    a shuffle equi-join for oversized models. The per-document
  *    aggregation is one shuffle keyed by the document id.
  */
object LanguageModel {

  private def gramRows(docs: DataFrame, n: Int, idCols: Seq[String],
      textCol: String): DataFrame =
    docs.select(idCols.map(col) :+
        TextAnalysis.tokens(lower(trim(col(textCol)))).as("__toks"): _*)
      .select(idCols.map(col) :+
        explode(TextAnalysis.ngramsOfTokens(col("__toks"), n)).as("gram"): _*)

  /** Train: n-gram counts `(gram, cnt)` over lowercased whitespace tokens
    * (n = 1 is the unigram model; higher n uses the same space-joined
    * gram strings as [[TextAnalysis.wordNgrams]]). */
  def train(docs: DataFrame, n: Int = 1, textCol: String = "text"): DataFrame =
    gramRows(docs, n, Nil, textCol)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Score: per-document mean negative log-likelihood under the add-one
    * (Laplace) smoothed model: for gram g,
    * `nll(g) = ln(N + V) − ln(cnt(g) + 1)` with N = total training grams
    * and V = vocabulary size, so unseen grams cost `ln(N + V)`. The
    * returned `nll` is the mean over the document's grams — a monotone
    * proxy for perplexity (`ppl = exp(nll)`), kept in log space so the
    * oracle hash-compare is stable. Documents with fewer than n tokens
    * have no grams and score 0.0 (kept, not dropped — the caller decides
    * the filter policy). */
  def scoreNll(docs: DataFrame, lm: DataFrame, n: Int = 1,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastLm: Boolean = true): DataFrame = {
    // one-row totals, collected once and inlined as literals (the LM is
    // an aggregated gram table — its totals row is driver-sized by
    // construction). An EMPTY model would make __N null (sum over zero
    // rows) and null-poison every per-gram nll into the 0.0 fallback — a
    // filter that silently passes everything; fail loudly instead.
    val tRow = lm.agg(coalesce(sum("cnt"), lit(0L)).cast("double"),
      count(lit(1)).cast("double")).head()
    val (nTot, vTot) = (tRow.getDouble(0), tRow.getDouble(1))
    require(vTot > 0,
      "scoreNll: empty language model — train() saw no grams (empty or fully-filtered corpus)")
    val lmSide = if (broadcastLm) broadcast(lm) else lm
    val scored = gramRows(docs, n, Seq(idCol), textCol)
      .join(lmSide, Seq("gram"), "left_outer")
      .select(col(idCol),
        (log(lit(nTot + vTot)) -
          log(coalesce(col("cnt"), lit(0L)).cast("double") + 1.0)).as("__nll"))
      .groupBy(idCol).agg(avg("__nll").as("nll"))
    // left join back so short documents (no grams) survive with nll = 0
    docs.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("nll"), lit(0.0)).as("nll"))
  }
}
