package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval, prefix-filtered Jaccard, stratified sampling, and
  * unicode canonicalization — semantics against driver-side references. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 --------------------------------------------------------------

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana banana"),
    (4L, "dog")
  ).toDF("doc_id", "text")

  /** The operator's exact arithmetic, driver-side. */
  private def refBm25(docs: Seq[(Long, String)], q: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Long] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / docs.size
    val qd = q.distinct
    val df = qd.map(t => t -> toks.values.count(_.contains(t))).toMap
    docs.flatMap { case (id, _) =>
      val dl = toks(id).size
      val micros = qd.flatMap { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0 || df(t) == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          Some(math.floor(idf * tf * (k1 + 1.0) /
            (tf + k1 * ((1.0 - b) + b * dl / avgdl)) * 1000000.0).toLong)
        }
      }
      if (micros.isEmpty) None else Some(id -> micros.sum)
    }.toMap
  }

  test("bm25 micro scores equal the driver-side reference exactly") {
    val q = Seq((10L, "apple banana")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, q, k = 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val ref = refBm25(Seq((1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana banana banana"), (4L, "dog")), Seq("apple", "banana"))
    assert(got == ref)
    // d4 shares no term → absent; d1 carries both terms → ranks first
    assert(!got.contains(4L))
    val ranked = Retrieval.bm25TopK(corpus, q, k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(ranked.head == 1L)
  }

  test("bm25 k cutoff, multiple queries, and duplicate query terms") {
    val q = Seq((10L, "apple banana"), (20L, "banana banana cherry"))
      .toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, q, k = 1)
    assert(got.count() == 2) // one row per query at k=1
    // duplicate "banana" in q20 must count once (distinct query terms):
    // the q20 score of d3 equals the single-term reference
    val s3 = Retrieval.bm25TopK(corpus, q, k = 10)
      .filter(col("query_id") === 20L && col("doc_id") === 3L)
      .select("score_micro").as[Long].head()
    val ref = refBm25(Seq((1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana banana banana"), (4L, "dog")),
      Seq("banana", "cherry"))
    assert(s3 == ref(3L))
  }

  test("bm25 rank ties break by doc_id and rare terms outweigh common ones") {
    // two docs with identical stats for the query term → tie broken by id
    val c = Seq((1L, "x y"), (2L, "x y"), (3L, "z z q")).toDF("doc_id", "text")
    val q = Seq((1L, "x z")).toDF("query_id", "qtext")
    val r = Retrieval.bm25TopK(c, q, k = 3)
      .orderBy("rank").select("doc_id", "rank").as[(Long, Int)].collect()
    // z: df=1 (rarer) beats x: df=2
    assert(r.head._1 == 3L)
    assert(r.map(_._1).toSeq == Seq(3L, 1L, 2L))
  }

  // ---- prefix-filtered Jaccard -------------------------------------------

  private def shingleSet(t: String, k: Int): Set[String] = {
    val w = t.trim.split("\\s+").toSeq
    if (w.size < k) Set.empty
    else w.sliding(k).map(_.mkString(" ")).toSet
  }

  test("prefix-filtered pairs equal the brute-force pair set") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),    // J(1,2) = 3/5 = 0.6 at k=3
      (3L, "a b c d e f"),    // J(1,3) = 1.0
      (4L, "a b c d e f g"),  // J(1,4) = 4/5 = 0.8
      (5L, "q r s t u v"),
      (6L, "totally different words here entirely now")
    ).toDF("doc_id", "text")
    val raw = Seq((1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "a b c d e f"),
      (4L, "a b c d e f g"), (5L, "q r s t u v"),
      (6L, "totally different words here entirely now"))
    for (t <- Seq(0.5, 0.8)) {
      val got = Dedup.prefixJaccardPairs(docs, k = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val ref = (for {
        (ia, ta) <- raw; (ib, tb) <- raw if ia < ib
        sa = shingleSet(ta, 3); sb = shingleSet(tb, 3)
        if sa.nonEmpty && sb.nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if sa.intersect(sb).size >= t * sa.union(sb).size
      } yield (ia, ib)).toSet
      assert(got == ref, s"threshold $t")
    }
  }

  test("degenerate near-identical corpus: pair set stays exact under the positional filter") {
    // 30 docs share one 12-word base; each appends a unique 2-word tail.
    // Every base shingle has df 30 (hot), every doc is "stopword soup"
    // (its two df-1 seam shingles cannot fill the 7-slot prefix), and the
    // true output IS quadratic (inter=10 of uni=14 → J≈0.714 ≥ 0.5 for
    // all 435 pairs) — the worst case the hot-shingle posture note in
    // prefixJaccardPairs documents. The positional filter must prune
    // nothing real: the full brute-force pair set survives.
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val raw = (1L to 30L).map(i => (i, s"$base u${i}a u${i}b"))
    val got = Dedup.prefixJaccardPairs(raw.toDF("doc_id", "text"),
        k = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ref = (for {
      (ia, ta) <- raw; (ib, tb) <- raw if ia < ib
      sa = shingleSet(ta, 3); sb = shingleSet(tb, 3)
      if sa.intersect(sb).size >= 0.5 * sa.union(sb).size
    } yield (ia, ib)).toSet
    assert(got == ref && got.size == 435)
  }

  test("positional filter prunes boilerplate-suffix candidates but never true pairs") {
    // two docs that share only shingles DEEP in both prefixes (a common
    // tail) but are far below threshold: the positional overlap bound
    // 1 + min(na−pa, nb−pb) < α kills the candidate before verification.
    // Docs 1/2 share a 4-word tail (2 shared shingles) out of ~18 each:
    // J ≈ 2/34 — a candidate the plain prefix join WOULD emit (df-2 tail
    // shingles sort early... rare but the bound, not df, is what prunes
    // deep-rank meets); the true near-pair 3/4 must survive.
    val t1 = (1 to 16).map(i => s"a$i").mkString(" ") + " z1 z2 z3 z4"
    val t2 = (1 to 16).map(i => s"b$i").mkString(" ") + " z1 z2 z3 z4"
    val near = (1 to 12).map(i => s"c$i").mkString(" ")
    val raw = Seq((1L, t1), (2L, t2), (3L, s"$near x1"), (4L, s"$near x2"))
    val got = Dedup.prefixJaccardPairs(raw.toDF("doc_id", "text"),
        k = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ref = (for {
      (ia, ta) <- raw; (ib, tb) <- raw if ia < ib
      sa = shingleSet(ta, 3); sb = shingleSet(tb, 3)
      if sa.intersect(sb).size >= 0.5 * sa.union(sb).size
    } yield (ia, ib)).toSet
    assert(got == ref)
    assert(got.contains((3L, 4L)) && !got.contains((1L, 2L)))
  }

  test("prefix bound is the exact decimal ceiling — no FP overshoot (ADVICE r6)") {
    // ceil(t·n) in double arithmetic rounds 0.82·100 to 82.00000000000001
    // → ceil 83 → a one-shorter prefix and silent recall loss; the
    // integer formulation must return the DECIMAL-exact ceiling for every
    // practical (≤6-decimal) threshold across a wide n sweep
    val ns = spark.range(1, 2001).toDF("n")
    for (t <- Seq(0.5, 0.82, 0.3, 0.75, 0.9, 0.123456, 1.0)) {
      val got = ns.select(col("n"),
          Dedup.ceilMulExact(t, col("n")).as("c")).as[(Long, Long)].collect()
      got.foreach { case (n, c) =>
        val exact = (BigDecimal(t.toString) * n)
          .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
        assert(c == exact, s"t=$t n=$n got $c want $exact")
      }
    }
  }

  test("prefix jaccard reports the exact similarity value") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(docs, k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0.8))) // 4 shared of 5 distinct shingles
  }

  // ---- stratified sampling -----------------------------------------------

  test("stratified sample returns exactly min(quota, stratum size) rows") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 105).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val got = Sampling.stratifiedSample(df, quota = 10, strataCol = "source",
      keyCol = "doc_id")
    val bySrc = got.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("big" -> 10L, "small" -> 5L))
    // pick is 1..quota within each stratum
    val picks = got.filter(col("source") === "big")
      .select("pick").as[Int].collect().sorted
    assert(picks.toSeq == (1 to 10))
  }

  test("stratified sample keeps null strata and null keys (no silent drop)") {
    val rows = (1 to 50).map(i => (s"k$i", "a")) ++
      (51 to 60).map(i => (s"k$i", null.asInstanceOf[String])) ++
      Seq((null.asInstanceOf[String], "a"))
    val df = rows.toDF("k", "src")
    val got = Sampling.stratifiedSample(df, quota = 5, strataCol = "src",
      keyCol = "k")
    val bySrc = got.groupBy("src").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the null stratum is a stratum like any other; the null key is a
    // candidate row of stratum "a" (51 rows there, 5 survive)
    assert(bySrc == Map(Some("a") -> 5L, None -> 5L))
  }

  test("stratified sample is deterministic and partition-invariant") {
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    def run(parts: Int) = Sampling.stratifiedSample(df.repartition(parts),
      quota = 7, strataCol = "source", keyCol = "doc_id")
      .select("doc_id", "source", "pick").as[(Long, String, Int)].collect().toSet
    assert(run(1) == run(8))
    assert(run(8).size == 21)
  }

  // ---- ranked per-group cap ----------------------------------------------

  test("topNPerGroup equals the single global window on skewed groups") {
    // hot group of 500 vs tiny groups; duplicate order values force the
    // key tiebreak to matter
    val df = ((1 to 500).map(i => (i.toLong, "hot", (i % 7).toLong)) ++
      (501 to 503).map(i => (i.toLong, "cold", 1L)))
      .toDF("doc_id", "source", "score")
    val got = Sampling.topNPerGroup(df, n = 10, groupCol = "source",
      orderCols = Seq(col("score").desc), keyCol = "doc_id", salts = 4)
      .select("doc_id", "source", "cap_rank")
      .as[(Long, String, Int)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id").asc)
    val want = df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= 10).select("doc_id", "source", "cap_rank")
      .as[(Long, String, Int)].collect().toSet
    assert(got == want)
    assert(got.count(_._2 == "cold") == 3) // short group kept whole
  }

  test("topNPerGroup is partition- and salt-count-invariant") {
    val df = (1 to 300).map(i => (i.toLong, s"s${i % 2}", (i % 11).toLong))
      .toDF("doc_id", "source", "score")
    def run(parts: Int, salts: Int) =
      Sampling.topNPerGroup(df.repartition(parts), n = 8, groupCol = "source",
        orderCols = Seq(col("score").desc), keyCol = "doc_id", salts = salts)
        .select("doc_id", "source", "cap_rank")
        .as[(Long, String, Int)].collect().toSet
    assert(run(1, 1) == run(8, 16))
    assert(run(1, 1).size == 16)
  }

  // ---- containment join --------------------------------------------------

  test("containment pairs equal brute force; subset pairs Jaccard misses") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "x y z q r s"),
      (3L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val probes = Seq(
      (100L, "a b c d e"),   // prefix of docs 1/3: containment 1.0
      (200L, "a b c x y z"), // mixed: shares only {a b c} with 1/3
      (300L, "zz zz zz")     // nowhere
    ).toDF("probe_id", "text")
    val got = Dedup.containmentPairs(probes, corpus, k = 3, threshold = 0.9)
      .select("probe_id", "doc_id", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((100L, 1L, 1.0), (100L, 3L, 1.0)))
    // the found pair has tiny Jaccard (3 of 14 shingles): the symmetric
    // join would require threshold <= 0.22 to see it at all
    val jac = Dedup.prefixJaccardPairs(
      corpus.unionByName(probes.withColumnRenamed("probe_id", "doc_id")),
      k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(!jac.exists(p => p._1 == 100L || p._2 == 100L))
  }

  // ---- corpus snapshot diff ----------------------------------------------

  test("corpusDiff classifies added/removed/changed/unchanged, null-text safe") {
    val oldC = Seq((1L, "same text"), (2L, "will change"), (3L, "gone"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val newC = Seq((1L, "same text"), (2L, "did change"), (4L, "brand new"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(oldC, newC).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
    // whitespace/case normalization rides the fingerprint
    val ws = Dedup.corpusDiff(
      Seq((9L, "A  b")).toDF("doc_id", "text"),
      Seq((9L, "a b ")).toDF("doc_id", "text")).as[(Long, String)].head()
    assert(ws == ((9L, "unchanged")))
  }

  // ---- unicode canonicalization ------------------------------------------

  test("unicodeClean composes NFC and strips control characters") {
    val in = Seq(
      (1L, "cafe\u0301"),           // combining acute composes to precomposed e-acute
      (2L, "\u212Bngstrom"),        // angstrom sign maps to A-ring (NFC singleton)
      (3L, "bell\u0007 kept\ttab\nnewline"),
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = in.select(col("doc_id"),
        TextAnalysis.unicodeClean(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "caf\u00E9")
    assert(got(2L) == "\u00C5ngstrom")
    assert(got(3L) == "bell kept\ttab\nnewline")
    assert(got(4L) == "plain ascii")
    assert(got(5L) == null)
  }

  test("prefix jaccard refuses a vocabulary-collapsed corpus, knob forces it through") {
    // 3 distinct words over 8000 x 50-word docs: the 27-shingle space is
    // exhausted, every shingle's posting list is ~corpus-sized, and the
    // candidate join would be quadratic chance collisions (the r9 100x
    // probe wedge, reproduced small). The sampled-df estimate must catch
    // it BEFORE any join runs and name the LSH alternative — and the
    // refusal must fire on the EXHAUSTION signal (all 27 sampled shingles
    // repeat), not on raw hot mass alone.
    val words = Array("aa", "bb", "cc")
    def collapsedCorpus(nDocs: Long) =
      spark.range(0, nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 50).map(i =>
          element_at(typedLit(words.toSeq),
            (pmod(xxhash64(col("id"), lit(i)), lit(3)) + 1).cast("int"))): _*)
          .as("text"))
    val err = intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(collapsedCorpus(8000), k = 3, threshold = 0.5)
        .count()
    }
    assert(err.getMessage.contains("minHashLshPairs"),
      s"guard message should point at the LSH path: ${err.getMessage}")
    assert(err.getMessage.contains("vocabulary is exhausted"),
      s"guard message should name the exhaustion signal: ${err.getMessage}")
    // the escape hatch: an explicit blowup budget forces the exact join —
    // EXECUTED (not just planned) on a few hundred collapsed docs, small
    // enough that the quadratic candidate join finishes in seconds —
    // proving the guard is a refusal, not a capability loss
    val forced = Dedup.prefixJaccardPairs(collapsedCorpus(300), k = 3,
      threshold = 0.5, maxCandidateBlowup = 1e12)
    assert(forced.columns.toSet == Set("id_a", "id_b", "jaccard"))
    assert(forced.count() > 0L,
      "forced exact join on the collapsed corpus should complete and find pairs")
  }

  test("prefix jaccard: clean-but-flagged corpus proceeds via the approx health bound") {
    // r12 (VERDICT r11 item 8): a few boilerplate shingles hot in EVERY
    // doc push the sampled candidate estimate past the refusal line
    // (est ≈ 1.5e8 > the 5e7 floor), but the vocabulary is mostly unique
    // (M/V − 1 ≈ 0.07 ≪ 0.5), so the approx_count_distinct mass/distinct
    // bound certifies health WITHOUT the vocabulary-sized exact-df pass
    // and the exact join proceeds. Rare-first prefixes ignore the hot
    // shingles, so the flagged-but-healthy corpus yields zero pairs —
    // completing (not refusing) is the pinned behavior.
    val docs = spark.range(0, 20000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("common boiler plate text here") +:
        (0 until 45).map(i => concat(lit("w"), col("id"), lit("x" + i))): _*)
        .as("text"))
    val got = Dedup.prefixJaccardPairs(docs, k = 3, threshold = 0.5)
    assert(got.count() == 0L,
      "healthy-but-flagged corpus should proceed through the exact join " +
        "and find no pairs (all docs differ in their unique tail)")
  }

  test("nfc_normalize registers through SQL and rejects wrong arity") {
    graft.functions.NfcNormalize.register(spark)
    val r = spark.sql("SELECT nfc_normalize('cafe\u0301') AS c").as[String].head()
    assert(r == "caf\u00E9")
    val err = intercept[Exception] {
      spark.sql("SELECT nfc_normalize('a', 'b')").collect()
    }
    assert(err.getMessage.contains("nfc_normalize expects 1 argument"))
  }
}
