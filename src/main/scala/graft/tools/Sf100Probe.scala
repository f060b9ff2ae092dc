package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100×-scale spot-bench of the six most expensive headline entries
  * (VERDICT r6 item 7): the 10× exponents in [[Sf1Probe]] all sit ≤ 1.0,
  * but one decade can hide drift — a component that is quadratic in a
  * slowly-growing quantity (candidate pairs, wedge fanout, per-window
  * event mass) shows up as a small exponent at 10× and a large one at
  * 100×. This probe adds the second decade: the same six entries run at
  * sf0.1, 10× (`/tmp/graft_sf1`, [[Sf1Probe]]'s corpus) and 100×
  * (`/tmp/graft_sf10`), printing steady-state min/max per scale point
  * and BOTH per-decade exponents, so drift between decades is a visible
  * number (e₂ ≫ e₁), not an extrapolation.
  *
  * The 100× corpus extends Sf1Probe's synthesis recipe one decade with
  * the same structural-faithfulness choices (and only the four tables
  * the six entries read):
  *  - customer: key range ×100 — the halving-chain closure entries
  *    depend only on the range (depth +log₂ 100 ≈ 6.6 levels, so the
  *    DOUBLING entries gain one round — output rows are what grows);
  *  - documents: 100 word-shuffled copies (same shingle cardinality per
  *    doc, no cross-copy near-dup PAIRS — true output stays sparse for
  *    prefix-Jaccard and MinHash-LSH. r9 correction to this recipe's
  *    original claim: candidate volume is NOT corpus-linear here,
  *    because the source corpus draws from only 31 distinct tokens —
  *    the ~30K-shingle space is exhausted and CHANCE shingle
  *    collisions make exact-blocking candidates birthday-quadratic;
  *    see [[heavy100x]]);
  *  - events: 100 copies, ids shifted, ts jittered 13 ms/copy within
  *    the same span — 100× rows PER WINDOW against the same number of
  *    fired closes, which is how event volume scales against a fixed
  *    window spec (the ISTREAM diff's per-close relation grows 100×);
  *  - lineitem: 100 copies, orderkeys shifted, part/supp ranges KEPT —
  *    the co-occurrence graph densifies into the same part/supplier
  *    nodes (hub degree ×100), the adversarial direction for triangle
  *    counting's degree-oriented wedge cap.
  *
  * Measured results are recorded in SURVEY §6 (run the probe; the
  * per-decade exponents e₁ = log₁₀(t₁₀ₓ/t₁ₓ) and e₂ = log₁₀(t₁₀₀ₓ/t₁₀ₓ)
  * are the drift signal — an operator whose e₂ materially exceeds its
  * e₁ has a growing quadratic term the first decade hid).
  */
object Sf100Probe {
  val entries = Seq("datalog_closure_seminaive", "prob_minmax_closure",
    "dedup_prefix_jaccard", "graph_triangles", "dedup_minhash_lsh",
    "stream_window_istream",
    // r7 session 2: the PassJoin candidate join is the same
    // hot-key-sensitive shape as prefix-Jaccard — worth both decades
    "dedup_editdistance",
    // r8 (VERDICT r7 item 4): the rest of the graph family, the
    // scaled-k SemDedup configuration (the r7 fixed-k exponent was the
    // round's one perf-weak mark — this leg pins the scaled-k fix), and
    // the heaviest WatDiv star
    "graph_components", "graph_pagerank", "graph_bfs_hops",
    "prob_sdd_wmc", "dedup_semdedup_scaled", "dedup_semdedup_lsh",
    "sparql_watdiv_s1",
    // r8 session 2: composed IVF-PQ — fixed nCells, so cells grow
    // linearly and the ADC join volume is (probed fraction)·n·m lookups
    "similarity_ivfpq_topk",
    // r9 (VERDICT r8 item 4): second-decade exponents for the remaining
    // near-linear candidates — BM25's postings-linear shape (e1 = 0.90
    // recorded r8 with no e2) and the containment join's in-row postings
    // kernel (its prefix-Jaccard sibling already probes both decades)
    "text_bm25_topk", "dedup_containment")

  /** Entries whose 100× point is out of the default probe's envelope —
    * skipped unless SF100_PROBE_HEAVY=1; their 10× exponent still
    * prints. sparql_watdiv_s1: the 1B-quad triplization (~40 GB of /tmp
    * parquet + comparable shuffle) busts the container's disk.
    * dedup_semdedup_scaled: flat Lloyd assignment is O(n·d·k) and the
    * scaled configuration sets k ∝ n, so the 100× point is ~25B
    * assignment rows per pass — the MEASURED reason the hyperplane
    * variant (dedup_semdedup_lsh, linear, probed at both decades)
    * exists.
    *
    * r9 additions, each with a measured root cause (the first 100×
    * attempt wedged one JVM in full-GC and filled the disk on another —
    * both chased to the TEST CORPUS's 31-token vocabulary, not to the
    * operators' shapes; see [[PrefixJaccardProbe]] and SURVEY §12):
    *  - text_bm25_topk: the documents table draws from 31 distinct
    *    tokens, so the query vocabulary covers the ENTIRE corpus
    *    vocabulary and the early pruning semi-join (the operator's
    *    scale lever on real queries) keeps every one of the ~1B
    *    occurrence rows — a corpus-LINEAR shuffle (~40 GB with spill)
    *    that distributes fine on a cluster but busts this container's
    *    single /tmp disk. e₁ = the honest recorded exponent.
    *  - dedup_prefix_jaccard / dedup_containment: 31 tokens ⇒ ~30K
    *    possible 3-gram shingles, EXHAUSTED already at 10× (sampled
    *    df≥2 vocab = 27,068 = the whole space, max df grows with N) —
    *    no shingle is rare, so prefix filtering cannot prune and the
    *    candidate volume is the birthday-quadratic Σ|postings|²
    *    (measured: 19.7M candidates at 10× for ZERO true pairs;
    *    projected ~2B at 100×). This is quadratic BY DATA: real web
    *    corpora have shingle vocabularies ≫ corpus size, where
    *    candidates track true near-dups (the AllPairs/PPJoin premise).
    *    On vocabulary-exhausted data the banded-and-capped
    *    MinHash-LSH family (probed linear at both decades) is the
    *    documented alternative. */
  val heavy100x = Set("sparql_watdiv_s1", "dedup_semdedup_scaled",
    "text_bm25_topk", "dedup_prefix_jaccard", "dedup_containment")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val midDir = "/tmp/graft_sf1"
    val bigDir = "/tmp/graft_sf10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    synthesize(spark, sfDir, midDir, 10)
    synthesize(spark, sfDir, bigDir, 100)

    val all = graft.SparkEntry.queries
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      all(name)(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      System.gc()
      s
    }
    val reps = sys.env.get("SF100_PROBE_REPS").map(_.toInt).getOrElse(3)
    def steady(name: String, dir: String): (Double, Double) = {
      val runs = (1 to reps).map(_ => run(name, dir))
      (runs.min, runs.max)
    }
    val only = sys.env.get("SF100_PROBE_ONLY").map(_.split(",").toSet)
    val heavyOk = sys.env.get("SF100_PROBE_HEAVY").exists(_ == "1")
    entries.filter(n => only.forall(_.contains(n))).foreach { name =>
      val (t1, t1x) = steady(name, sfDir)
      val (t10, t10x) = steady(name, midDir)
      val e1 = math.log10(t10 / t1)
      if (heavy100x.contains(name) && !heavyOk) {
        println(f"[sf100-probe] $name%-28s sf0.1=$t1%6.2f (max $t1x%6.2f)  " +
          f"10x=$t10%7.2f (max $t10x%7.2f)  100x=SKIPPED (SF100_PROBE_HEAVY unset)  e1=$e1%5.2f")
      } else {
        val (t100, t100x) = steady(name, bigDir)
        val e2 = math.log10(t100 / t10)
        println(f"[sf100-probe] $name%-28s sf0.1=$t1%6.2f (max $t1x%6.2f)  " +
          f"10x=$t10%7.2f (max $t10x%7.2f)  100x=$t100%8.2f (max $t100x%8.2f)  " +
          f"e1=$e1%5.2f  e2=$e2%5.2f")
      }
    }
    spark.stop()
  }

  /** Sf1Probe's synthesis recipe at arbitrary `factor`, restricted to the
    * four tables [[entries]] read. Guarded per table; `/tmp/graft_sf1` as
    * built by Sf1Probe satisfies the guards and is reused as the 10×
    * point unchanged. */
  def synthesize(spark: SparkSession, sfDir: String, outDir: String,
      factor: Int): Unit = {
    if (!new java.io.File(s"$outDir/customer.parquet/_SUCCESS").exists()) {
      println(s"[sf100-probe] synthesizing ${factor}x customer → $outDir …")
      val cMax = spark.read.parquet(s"$sfDir/customer.parquet")
        .agg(max(col("c_custkey"))).first().getLong(0)
      spark.range(1, cMax * factor + 1).select(col("id").as("c_custkey"),
          concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0")).as("c_name"),
          pmod(col("id"), lit(25L)).cast("int").as("c_nationkey"),
          (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 100.0
            - 1000.0).as("c_acctbal"),
          element_at(typedLit(Seq("BUILDING", "AUTOMOBILE", "MACHINERY",
            "HOUSEHOLD", "FURNITURE")),
            (pmod(col("id"), lit(5L)) + 1).cast("int")).as("c_mktsegment"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    }
    if (!new java.io.File(s"$outDir/documents.parquet/_SUCCESS").exists()) {
      println(s"[sf100-probe] synthesizing ${factor}x documents → $outDir …")
      val shuffleWords = udf((text: String, seed: Long) => {
        val words = text.split(" ").toSeq
        new scala.util.Random(seed).shuffle(words).mkString(" ")
      })
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until factor).map { cp =>
        docs.select((col("doc_id") + lit(cp.toLong * 10000000L)).as("doc_id"),
          shuffleWords(col("text"), col("doc_id") + lit(cp * 7919)).as("text"),
          col("source"))
      }.reduce(_ unionByName _)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    if (!new java.io.File(s"$outDir/events.parquet/_SUCCESS").exists()) {
      println(s"[sf100-probe] synthesizing ${factor}x events → $outDir …")
      val ev = graft.streaming.EventsReader.eventsMs(spark, sfDir)
      (0 until factor).map { cp =>
        ev.select((col("event_id") + lit(cp.toLong * 10000000L)).as("event_id"),
          timestamp_millis(col("tms") + lit(cp.toLong * 13L)).as("ts"),
          (col("user_id") + lit(cp.toLong * 1000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
    if (!new java.io.File(s"$outDir/lineitem.parquet/_SUCCESS").exists()) {
      println(s"[sf100-probe] synthesizing ${factor}x lineitem → $outDir …")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      (0 until factor).map { cp =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(cp.toLong * 100000000L))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }
    if (!new java.io.File(s"$outDir/embeddings.parquet/_SUCCESS").exists()) {
      // embeddings: FRESH hash-derived vectors, not jittered copies —
      // random directions in R⁶⁴ concentrate near orthogonality, so the
      // near-dup pair OUTPUT stays sparse while cell occupancy (the
      // Σ|cell|² candidate volume that scaled-k SemDedup is measured on)
      // grows exactly ×factor. Jittered copies would plant cross-copy
      // near-dups and make the measurement output-quadratic by DATA.
      println(s"[sf100-probe] synthesizing ${factor}x embeddings → $outDir …")
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      spark.range(1, n * factor + 1).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("id"), i), lit(2000001L)).cast("double")
              / 1000000.0) - 1.0).cast("float")).as("embedding"),
          pmod(col("id"), lit(10L)).cast("int").as("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    // the remaining TPC-H-ish dimension tables copy through unchanged —
    // the triplizer reads all seven, and the probe's WatDiv star is a
    // lineitem-only shape (the scaled table)
    Seq("region", "nation", "supplier", "part", "orders").foreach { tbl =>
      if (!new java.io.File(s"$outDir/$tbl.parquet/_SUCCESS").exists()) {
        spark.read.parquet(s"$sfDir/$tbl.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$tbl.parquet")
      }
    }
  }
}
