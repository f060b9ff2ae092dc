package graft.pipeline

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based differential oracles for the curation joins: on random
  * corpora, the prefix-filtered Jaccard join, the one-sided containment
  * join, and the bucket-blocked interval join must each equal their
  * brute-force definitions exactly (fixed seeds — every sample costs
  * Spark jobs, like ReasonerPropertySpec).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  // small vocabulary → heavy shingle sharing → the filters are stressed
  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val g = Gen.listOfN(nDocs, docGen)
    g.pureApply(Gen.Parameters.default, Seed(seed)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
  }

  private def shingleSet(t: String, k: Int): Set[String] = {
    val w = t.trim.split("\\s+").toSeq
    if (t.trim.isEmpty || w.size < k) Set.empty
    else w.sliding(k).map(_.mkString(" ")).toSet
  }

  test("prefix Jaccard ≡ brute force on random corpora and thresholds") {
    for ((seed, t) <- Seq((1L, 0.4), (2L, 0.6), (3L, 0.8), (4L, 0.5))) {
      val docs = corpus(seed, 14)
      val got = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
          k = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val ref = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta, 2); sb = shingleSet(tb, 2)
        if sa.nonEmpty && sb.nonEmpty
        if sa.intersect(sb).size >= t * sa.union(sb).size
      } yield (ia, ib)).toSet
      assert(got == ref, s"seed=$seed t=$t: got $got vs $ref")
    }
  }

  /** Classic two-row DP Levenshtein — the JVM-side reference. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("edit-distance join ≡ brute force on random corpora and radii") {
    // 3-char alphabet, lengths 0-12: most strings sit within a few edits
    // of each other, segments are 1-2 chars (maximally hot candidate
    // keys), and lengths straddle the short-leg boundary at every radius
    val charGen = Gen.oneOf('a', 'b', 'c')
    val sGen = for {
      n <- Gen.choose(0, 12); cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    for ((seed, d) <- Seq((11L, 1), (12L, 2), (13L, 3), (14L, 4))) {
      val docs = Gen.listOfN(16, sGen)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"), maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      val ref = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        e = lev(ta, tb) if e <= d
      } yield (ia, ib, e.toLong)).toSet
      assert(got == ref, s"seed=$seed d=$d: got ${got.size} vs ${ref.size} pairs")
    }
  }

  test("containment ≡ brute force on random probe/corpus splits") {
    for ((seed, t) <- Seq((5L, 0.6), (6L, 0.9), (7L, 0.75))) {
      val all = corpus(seed, 16)
      val (probes, docs) = all.partition(_._1 % 3 == 0)
      val got = Dedup.containmentPairs(
          probes.toDF("probe_id", "text"), docs.toDF("doc_id", "text"),
          k = 2, threshold = t)
        .select("probe_id", "doc_id").as[(Long, Long)].collect().toSet
      val ref = (for {
        (ip, tp) <- probes; (id, td) <- docs
        sp = shingleSet(tp, 2); sd = shingleSet(td, 2)
        if sp.nonEmpty && sd.nonEmpty
        if sp.intersect(sd).size >= t * sp.size
      } yield (ip, id)).toSet
      assert(got == ref, s"seed=$seed t=$t: got $got vs $ref")
    }
  }

  test("interval join ≡ brute force on random event sets and windows") {
    val tsGen = for {
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("u", "v", "w")
        ts <- Gen.choose(0L, 500L)
      } yield (k, ts))
    } yield rows
    for ((seed, lo, hi) <- Seq((8L, -50L, 50L), (9L, -120L, -1L),
        (10L, 0L, 0L), (11L, 7L, 200L))) {
      val rows = tsGen.pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val (ls, rs) = rows.partition(_._1 % 2 == 0)
      val got = EventOps.intervalJoin(ls.toDF("lid", "k", "tms"),
          rs.toDF("rid", "k", "tms").withColumnRenamed("rid", "rid"),
          Seq("k"), "tms", "tms", lo, hi, Seq("rid"))
        .select("lid", "matched_rid").as[(Long, Long)].collect().toSeq
      val ref = for {
        (li, lk, lt) <- ls; (ri, rk, rt) <- rs
        if lk == rk && rt >= lt + lo && rt <= lt + hi
      } yield (li, ri)
      assert(got.sorted == ref.sorted, s"seed=$seed [$lo,$hi]")
      assert(got.size == got.distinct.size, s"seed=$seed duplicate pairs")
    }
  }

  test("stratified quotas hold on random skewed strata") {
    for (seed <- Seq(12L, 13L)) {
      val gen = Gen.listOfN(120, Gen.oneOf("s0", "s0", "s0", "s1", "s2"))
      val rows = gen.pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val quota = 9
      val got = Sampling.stratifiedSample(rows.toDF("doc_id", "source"),
          quota, "source", "doc_id")
        .groupBy("source").count().as[(String, Long)].collect().toMap
      val sizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      sizes.foreach { case (s, n) =>
        assert(got(s) == math.min(quota.toLong, n), s"seed=$seed stratum $s") }
    }
  }
}
