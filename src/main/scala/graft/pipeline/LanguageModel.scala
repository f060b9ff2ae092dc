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

  /** Trigram language model with STUPID BACKOFF (Brants et al. 2007,
    * "Large language models in machine translation" — the smoothing that
    * made web-scale count LMs practical precisely because, unlike
    * Kneser-Ney, it needs no normalization pass: each level is a bare
    * count ratio damped by α per backoff step):
    *
    *   s(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)           if the trigram was seen
    *              = α · c(w₂w₃)/c(w₂)           else if the bigram was
    *              = α² · c(w₃)/N                 else if the unigram was
    *              = α² / (N + V)                 for OOV tokens
    *
    * Returns per-document `(idCol, n_tri, nll_micro)`: the trigram count
    * and Σ floor(−ln(s)·10⁶) in integer micro-units — summation-order
    * independent, so the whole model (training counts AND scoring) is
    * hash-checkable; mean nll is `nll_micro / 1e6 / n_tri`. Documents
    * with fewer than 3 tokens survive with (0, 0).
    *
    * Scale posture: three gram-count shuffles with map-side partial
    * aggregation build the model; all five model tables are
    * vocabulary-sized and broadcast into the scoring join; the final
    * aggregation is one doc-keyed shuffle. */
  def trigramBackoffNll(score: DataFrame, train: DataFrame, alpha: Double = 0.4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val c3 = LanguageModel.train(train, n = 3, textCol)
      .select(col("gram"), col("cnt").as("__c3"))
    val c2 = LanguageModel.train(train, n = 2, textCol)
    val c1 = LanguageModel.train(train, n = 1, textCol)
    val tRow = c1.agg(coalesce(sum("cnt"), lit(0L)).cast("double"),
      count(lit(1)).cast("double")).head()
    val (nTot, vTot) = (tRow.getDouble(0), tRow.getDouble(1))
    require(vTot > 0, "trigramBackoffNll: empty language model")
    val tri = gramRows(score, 3, Seq(idCol), textCol)
      .withColumn("__p", split(col("gram"), " "))
      .select(col(idCol), col("gram"),
        concat_ws(" ", element_at(col("__p"), 1), element_at(col("__p"), 2)).as("__pre"),
        concat_ws(" ", element_at(col("__p"), 2), element_at(col("__p"), 3)).as("__suf"),
        element_at(col("__p"), 2).as("__w2"), element_at(col("__p"), 3).as("__w3"))
    val a = lit(alpha)
    val a2 = lit(alpha * alpha)
    val nll = when(col("__c3").isNotNull,
        -log(col("__c3").cast("double") / col("__c2p").cast("double")))
      .when(col("__c2s").isNotNull,
        -log(a * (col("__c2s").cast("double") / col("__c1w2").cast("double"))))
      .when(col("__c1w3").isNotNull,
        -log(a2 * (col("__c1w3").cast("double") / lit(nTot))))
      .otherwise(-log(a2 / lit(nTot + vTot)))
    val scored = tri
      .join(broadcast(c3), Seq("gram"), "left_outer")
      .join(broadcast(c2.select(col("gram").as("__pre"), col("cnt").as("__c2p"))),
        Seq("__pre"), "left_outer")
      .join(broadcast(c2.select(col("gram").as("__suf"), col("cnt").as("__c2s"))),
        Seq("__suf"), "left_outer")
      .join(broadcast(c1.select(col("gram").as("__w2"), col("cnt").as("__c1w2"))),
        Seq("__w2"), "left_outer")
      .join(broadcast(c1.select(col("gram").as("__w3"), col("cnt").as("__c1w3"))),
        Seq("__w3"), "left_outer")
      .select(col(idCol), floor(nll * lit(1000000.0)).cast("long").as("__m"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tri"), sum(col("__m")).as("nll_micro"))
    score.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }

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
