package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training/encoding semantics on the classic Sennrich et al. 2016
  * walkthrough histogram. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val hist = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge learning: counts weighted by word frequency, lex tiebreak") {
    val merges = Bpe.trainMerges(hist, numMerges = 3)
    // pair counts round 1: es=9, st=9 (tie → lex picks (e,s)), we=8, lo=ow=7
    // round 2: (es,t)=9; round 3: lo=ow=7 tie → (l,o)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("merge learning stops early when no pair repeats") {
    val m = Bpe.trainMerges(Seq(("ab", 1L), ("cd", 1L)), numMerges = 10)
    assert(m.isEmpty) // every pair occurs once — nothing worth merging
    val m2 = Bpe.trainMerges(Seq(("aa", 2L)), numMerges = 10)
    assert(m2 == Seq(("a", "a"))) // then "aa" has no pairs left
  }

  test("encoding applies merges in rank order and round-trips the word") {
    val merges = Bpe.trainMerges(hist, numMerges = 3)
    val ranks = merges.zipWithIndex.toMap
    // lowest: l o w e s t → es → est → lo ⇒ [lo, w, est]
    assert(Bpe.applyMerges("lowest", ranks) == Seq("lo", "w", "est"))
    // unseen characters survive as singletons; concatenation restores
    assert(Bpe.applyMerges("zest", ranks) == Seq("z", "est"))
    assert(Bpe.applyMerges("", ranks).isEmpty)
    for (w <- Seq("lowest", "zest", "qqq"))
      assert(Bpe.applyMerges(w, ranks).mkString == w)
  }

  test("distributed encode matches driver-side apply; counts consistent") {
    val docs = Seq((1L, "low lowest"), (2L, "newest widest new"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 5, maxWords = 100)
    val ranks = merges.zipWithIndex.toMap
    val out = Bpe.encode(docs, merges)
      .select($"doc_id", $"bpe_tokens", $"n_bpe_tokens")
      .as[(Long, Seq[String], Int)].collect().map(r => r._1 -> r).toMap
    val expected1 =
      Seq("low", "lowest").flatMap(w => Bpe.applyMerges(w, ranks))
    assert(out(1L)._2 == expected1)
    assert(out(1L)._3 == expected1.size)
    assert(out(3L)._2.isEmpty && out(3L)._3 == 0)
    // every document's tokens concatenate back to its words
    assert(out(2L)._2.mkString == "newestwidestnew")
  }

  test("word histogram caps to top-k deterministically") {
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val h = Bpe.wordHistogram(docs, maxWords = 2)
      .as[(String, Long)].collect().toSeq
    assert(h.toSet == Set(("b", 3L), ("a", 2L))) // c cut by the cap
  }
}
