package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016 — the standard subword tokenizer for LLM training corpora).
  *
  * Scale shape (how real tokenizer trainers work over 100 TB): the corpus
  * reduces to a WORD HISTOGRAM first — one token-keyed shuffle with
  * map-side combine, output bounded by vocabulary size, capped to the
  * top `maxWords` — and the merge loop runs over that histogram only.
  * Pair statistics over a capped histogram are driver-sized (HuggingFace
  * `tokenizers` trains from exactly this word-count table); the corpus
  * itself is touched ONCE. Encoding broadcasts the learned merge ranks
  * and runs as a narrow mapPartitions-style UDF — merge application is
  * an inherently iterative per-word loop no relational operator
  * expresses, the documented UDF exception.
  */
object Bpe {

  /** Distributed word histogram: top `maxWords` whitespace words by
    * (count desc, word asc) — [[TextAnalysis.vocabulary]] over the
    * lowered text (ONE ranking surface; empty words filtered before the
    * cap so they never occupy a rank slot). */
  def wordHistogram(docs: DataFrame, maxWords: Int,
      textCol: String = "text"): DataFrame =
    TextAnalysis.vocabulary(
        docs.select(lower(trim(col(textCol))).as("text")), maxWords,
        minTokenLength = 1)
      .select(col("token").as("word"), col("cnt"))

  /** Driver-side merge learning over a word histogram: `numMerges`
    * rounds of (count all adjacent symbol pairs weighted by word count,
    * merge the most frequent — ties broken lexicographically so training
    * is deterministic). Words start as character sequences; no
    * end-of-word marker (the GPT-2 convention). Stops early when no pair
    * occurs twice. */
  def trainMerges(hist: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val (best, bestCnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
      if (bestCnt < 2) return merges.result() // nothing repeats — done
      merges += best
      val joined = best._1 + best._2
      words = words.map { case (syms, c) =>
        if (syms.length < 2) (syms, c)
        else {
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Train end-to-end: histogram shuffle once, merge loop on the driver. */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 100000,
      textCol: String = "text"): Seq[(String, String)] = {
    val hist = wordHistogram(docs, maxWords, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(hist, numMerges)
  }

  /** Apply learned merges to one word: repeatedly merge the
    * lowest-ranked applicable pair (the standard BPE apply loop). */
  private[pipeline] def applyMerges(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Distributed encode: (id, bpe_tokens: array<string>, n_bpe_tokens).
    * The merge-rank table ships in the task closure — ≤ numMerges
    * entries, KB-sized, with no broadcast-variable lifecycle to leak
    * across repeated calls in a long session. Lowercasing uses
    * Locale.ROOT to match the SQL `lower()` the histogram was trained
    * with (a tr-TR executor default locale would otherwise dot/undot
    * 'i' differently and miss every learned merge on such words). The
    * UDF is narrow and touches each document once. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf((text: String) =>
      if (text == null) Array.empty[String]
      else text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(w => applyMerges(w, ranks)).toArray)
    docs.select(col(idCol), enc(col(textCol)).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }
}
