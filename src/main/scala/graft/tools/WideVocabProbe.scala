package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-decade exponents for the three prefix/postings-family entries
  * on a REALISTIC corpus (VERDICT r9 item 5). The driver testdata's
  * documents table draws from 31 distinct tokens, so its ~30K-shingle
  * space saturates and exact blocking goes birthday-quadratic BY DATA —
  * the r9 probe correctly attributed the 100× walls of `text_bm25_topk`,
  * `dedup_prefix_jaccard` and `dedup_containment` to that corpus, but an
  * honest e₂ on non-degenerate data was still missing.
  *
  * This probe synthesizes a Zipf corpus the way real web text behaves:
  *  - vocabulary 200K (≫ any corpus slice here), token rank drawn
  *    log-uniformly — P(rank = k) ∝ 1/k, i.e. Zipf s≈1, the standard
  *    web-text law; the hottest token carries ~5.7% of mass (like "the")
  *    while the tail stays effectively unique;
  *  - 1% planted near-dup pairs (prefix-trimmed copies) so the verify
  *    stages have real output;
  *  - containment probes = contiguous token slices of corpus docs
  *    (shingle subsets, true containment hits);
  *  - BM25 queries = 4-token Zipf draws (hot + rare mix, the premise of
  *    the query-vocabulary pruning semi-join).
  *
  * Three scale points (1× = 5K docs, 10×, 100× = 500K docs × 120
  * tokens ≈ 60M tokens) print per-decade exponents e₁/e₂ exactly like
  * [[Sf100Probe]]; results land in SURVEY §6. Deterministic throughout
  * (xxhash64-derived uniforms), no RNG state.
  */
object WideVocabProbe {
  private val vocab = 200000
  private val docLen = 120

  /** Zipf(s≈1) token: rank = ⌊V^u⌋+1 with u = hash-uniform in [0,1). */
  private def zipfTok(seedA: org.apache.spark.sql.Column,
      seedB: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val u = (pmod(xxhash64(seedA, seedB), lit(1048576L)).cast("double") + 0.5) / 1048576.0
    concat(lit("t"), floor(pow(lit(vocab.toDouble), u)).cast("long"))
  }

  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(docLen - 1)),
        i => zipfTok(col("id"), i)), " ").as("text"))
    // planted near-dups: every 100th doc gets a copy with the first 6
    // tokens (5%) replaced — Jaccard ≈ 0.89, comfortably above the 0.8
    // probe threshold, a true pair for the verify stages
    val dups = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"),
        concat(
          array_join(transform(sequence(lit(0), lit(5)),
            i => zipfTok(col("doc_id") + 7919, i)), " "),
          lit(" "),
          array_join(slice(split(col("text"), " "), 7, docLen), " ")).as("text"))
    base.unionByName(dups)
  }

  def snippets(spark: SparkSession, docs: DataFrame, n: Int): DataFrame =
    docs.filter(col("doc_id") % 37 === 1).limit(n)
      .select(col("doc_id").as("probe_id"),
        array_join(slice(split(col("text"), " "), 11, 30), " ").as("text"))

  def queries(spark: SparkSession, n: Int): DataFrame =
    spark.range(n).select(col("id").as("query_id"),
      array_join(transform(sequence(lit(0), lit(3)),
        i => zipfTok(col("id") + 104729, i)), " ").as("qtext"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.get("WIDE_PROBE_REPS").map(_.toInt).getOrElse(2)
    val scales = Seq(("1x", 5000L), ("10x", 50000L), ("100x", 500000L))

    // materialize each corpus once (parquet in /tmp) so the probed wall
    // is the OPERATOR, not 60M rows of expression-generated text
    val dirs = scales.map { case (label, n) =>
      val dir = s"/tmp/graft_widevocab_$label"
      val docsPath = s"$dir/documents.parquet"
      if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
        corpus(spark, n).repartition(32).write.mode("overwrite").parquet(docsPath)
      }
      (label, dir)
    }

    def t(f: => Long): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val c = f
        val s = (System.nanoTime() - t0) / 1e9
        System.gc(); (s, c)
      }
      runs.map(_._1).min
    }
    // threshold 0.8, the realistic dedup operating point: prefix filtering
    // keeps each doc's (1−t)·n+1 RAREST shingles — ~24 of 118 here, all
    // effectively unique on a 200K vocabulary, so candidates track true
    // pairs. (A first cut probed t = 0.5: the prefix then spans HALF the
    // doc's shingles, mid-hot shingles enter prefixes, and chance
    // candidates go birthday-quadratic — the KNOWN AllPairs/PPJoin
    // low-threshold envelope, measured here at e₁ = 1.69 before the
    // operating point was corrected, not an implementation defect.)
    val jobs: Seq[(String, DataFrame => Long)] = Seq(
      ("dedup_prefix_jaccard", d =>
        graft.pipeline.Dedup.prefixJaccardPairs(d, k = 3, threshold = 0.8).count()),
      ("dedup_containment", d =>
        graft.pipeline.Dedup.containmentPairs(
          snippets(spark, d, 200), d, k = 3, threshold = 0.9).count()),
      ("text_bm25_topk", d =>
        graft.pipeline.Retrieval.bm25TopK(d, queries(spark, 50), k = 10).count()))

    // host-noise discipline (SURVEY §12 host epoch): report the CPU
    // steal fraction around every timed leg so a contended-VM window is
    // visible IN the artifact instead of masquerading as a regression
    def stealSnap(): (Long, Long) = {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next().split("\\s+")
      val total = l.drop(1).take(8).map(_.toLong).sum
      (l(8).toLong, total)
    }
    val only = sys.env.get("WIDE_PROBE_ONLY").map(_.split(",").toSet)
    jobs.filter(j => only.forall(_.contains(j._1))).foreach { case (name, job) =>
      val times = dirs.map { case (label, dir) =>
        val d = spark.read.parquet(s"$dir/documents.parquet")
        val (s0, t0) = stealSnap()
        val s = t(job(d))
        val (s1, t1) = stealSnap()
        val steal = if (t1 > t0) (s1 - s0).toDouble / (t1 - t0) else 0.0
        println(f"[wide-probe] $name%-22s $label%-5s $s%8.2f s  steal=$steal%.3f")
        s
      }
      val e1 = math.log10(times(1) / times(0))
      val e2 = math.log10(times(2) / times(1))
      println(f"[wide-probe] $name%-22s e1=$e1%5.2f  e2=$e2%5.2f")
    }
    spark.stop()
  }
}
