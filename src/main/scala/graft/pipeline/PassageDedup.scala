package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Passage-level exact-substring deduplication — the corpus-scale
  * analogue of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better"): token spans repeated verbatim across many
  * documents are boilerplate (licenses, navigation chrome, templated
  * headers) and get scrubbed from every document before training, while
  * the surrounding unique prose is kept. Distinct from document-level
  * dedup ([[Dedup]]): no document is dropped, repeated PASSAGES are.
  *
  * Where the paper builds a corpus-wide suffix array, the distributed
  * formulation detects repetition at fixed k-token granularity: any
  * repeated substring of length ≥ 2k−1 tokens is guaranteed to contain a
  * repeated k-gram, so k-gram document frequency is a recall-complete
  * detector at that resolution — the same pigeonhole argument as
  * [[Dedup.simHash]] segment blocking.
  *
  * Scale posture (100 TB corpus):
  *  - hot-span detection is one shuffle keyed by gram (distinct-doc
  *    counting with partial aggregation) — never a document×document
  *    pairing;
  *  - the hot set is small by construction (only spans repeated across
  *    ≥ minDocs documents survive) and is broadcast back for the
  *    membership semi-join by default (`broadcastHot = false` falls back
  *    to a shuffle semi-join);
  *  - reconstruction is per-document Catalyst HOFs over the token array —
  *    narrow, codegen'd, no UDFs.
  *
  * Matching is over lowercased tokens (repetition detection is
  * case-insensitive); reconstruction keeps the original-case tokens and
  * normalizes whitespace to single spaces (both engines reproduce this
  * exactly, so the oracle hash-checks the cleaned text end-to-end).
  */
object PassageDedup {

  /** `(doc, 1-based start)` rows for every token k-gram, with the gram. */
  private def gramRows(docs: DataFrame, k: Int, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        TextAnalysis.tokens(lower(trim(col(textCol)))).as("__ltoks"))
      .select(col(idCol),
        posexplode(TextAnalysis.ngramsOfTokens(col("__ltoks"), k)))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("gram"))

  private def hotOf(g: DataFrame, minDocs: Int, idCol: String): DataFrame =
    g.groupBy("gram").agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select("gram")

  /** Hot spans: k-grams appearing in at least `minDocs` DISTINCT
    * documents. */
  def hotSpans(docs: DataFrame, k: Int = 8, minDocs: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    hotOf(gramRows(docs, k, idCol, textCol), minDocs, idCol)

  /** Every document with tokens covered by any hot span removed. A token
    * at 1-based position i is dropped iff some hot gram starts at s with
    * s ≤ i < s + k. Documents with no hot span (or fewer than k tokens)
    * pass through with whitespace-normalized text. */
  def scrubbed(docs: DataFrame, k: Int = 8, minDocs: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastHot: Boolean = true): DataFrame = {
    val g = gramRows(docs, k, idCol, textCol)
    val hot0 = hotOf(g, minDocs, idCol)
    val hot = if (broadcastHot) broadcast(hot0) else hot0
    val starts = g.join(hot, Seq("gram"), "left_semi")
      .groupBy(idCol).agg(collect_set(col("pos")).as("__starts"))
    docs.select(col(idCol), TextAnalysis.tokens(trim(col(textCol))).as("__toks"))
      .join(starts, Seq(idCol), "left_outer")
      .select(col(idCol),
        concat_ws(" ", filter(col("__toks"), (_, i) =>
          !exists(coalesce(col("__starts"), array().cast("array<int>")),
            s => s <= i + 1 && i + 1 < s + k))).as("clean_text"))
  }
}
