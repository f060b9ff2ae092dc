package graft.pipeline

import graft.reasoner.Reasoner.RoundCheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the 100 TB posture):
  *  - exact dedup = hash-partitioned groupBy on a content digest — one
  *    shuffle of (digest, id), never of full documents
  *  - MinHash/LSH = per-doc signatures (narrow), band buckets, then a
  *    bucket-join restricted to same-bucket pairs — candidate pairs only,
  *    never the n² cross join
  *  - verification joins carry doc ids + signatures, not text
  *  - skew: a hot bucket (e.g. empty docs) is capped via per-bucket
  *    row_number limit before the self-join
  */
object Dedup {

  import TextAnalysis.tokens

  // ---- exact -------------------------------------------------------------

  /** Groups of byte-identical texts (normalized): (fp, doc_id, keep).
    * keep = the group's minimum id survives. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // null text has no content to compare — a per-row sentinel keeps every
    // null-text doc its own singleton group instead of Window.partitionBy
    // lumping all nulls together and dropping all but one (review finding)
    val fp = coalesce(TextAnalysis.fingerprint(col(textCol)),
      concat(lit("__null__"), col(idCol).cast("string")))
    val w = Window.partitionBy("fp")
    docs.select(col(idCol), fp.as("fp"))
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
  }

  /** Survivors after exact dedup (min doc_id per content fingerprint). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    exactGroups(docs, idCol, textCol)
      .filter(col(idCol) === col("keep_id"))
      .select(col(idCol), col("fp"), col("group_size"))

  /** Streaming exact dedup over a live document feed: one representative
    * per content fingerprint survives — the first MICRO-BATCH to carry a
    * fingerprint wins, and duplicates in later batches are dropped via
    * keyed state that EXPIRES once the event-time watermark passes
    * `horizon` — so state is bounded by the horizon's unique-content
    * rate, not the corpus (`dropDuplicatesWithinWatermark`, the same
    * operator the RSP plane's R2S stages use). Within a single
    * micro-batch the representative is arbitrary; min-id
    * canonicalization is the batch `exactDedup`'s job, and catching
    * duplicates OLDER than the horizon is `incrementalExactDedup`'s.
    * StreamingSpec pins the batch/stream agreement on a replayed feed. */
  def streamingExactDedup(docs: DataFrame, tsCol: String, horizon: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.withColumn("fp",
        // same null-text sentinel as exactGroups: every null-text doc is
        // its own singleton, never deduped against other nulls
        coalesce(TextAnalysis.fingerprint(col(textCol)),
          concat(lit("__null__"), col(idCol).cast("string"))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Incremental exact dedup: drop arrivals whose content fingerprint
    * already exists in `corpus` — the "dedupe the new crawl against the
    * standing 100 TB corpus" shape. A Bloom filter over the corpus
    * fingerprints (built once, broadcast — ~1.2 bytes/item at 1 % fpp)
    * prunes the overwhelming majority of new docs WITHOUT shuffling the
    * corpus; only Bloom-positive candidates (true dupes + the fpp tail)
    * reach the exact anti join, so the join's corpus side is read but the
    * new side shrinks to ~|dupes|. Result is EXACT — the filter only
    * routes, never decides. Expected-items/fpp tune the broadcast size;
    * at 10^10 corpus docs and 1 % fpp the filter is ~12 GB, so shard by
    * fp prefix at that scale (documented here, not needed at test SF). */
  def incrementalExactDedup(newDocs: DataFrame, corpus: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.01,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val corpusFp = corpus.select(fp.as("fp"))
    val newFp = newDocs.select(col(idCol), fp.as("fp"))
    val bloom = corpusFp.stat.bloomFilter("fp", expectedItems, fpp)
    val bc = newDocs.sparkSession.sparkContext.broadcast(bloom)
    // null fingerprint (null text) matches nothing in the corpus — and
    // mightContainString NPEs on null, so guard before probing
    val mightExist = udf((f: String) => f != null && bc.value.mightContainString(f))
    val (clean, candidates) = (newFp.filter(!mightExist(col("fp"))),
      newFp.filter(mightExist(col("fp"))))
    // left_anti is insensitive to right-side duplicates — no distinct,
    // which would add a full shuffle of every corpus fingerprint
    clean.unionByName(candidates.join(corpusFp, Seq("fp"), "left_anti"))
  }

  // ---- shingles ----------------------------------------------------------

  /** Distinct k-word shingles per document: (id, shingle). The per-row
    * array build is the compiled [[graft.functions.ShingleArray]]
    * kernel (bit-identical set and order to the
    * transform/concat_ws/array_distinct column chain it replaced —
    * ShinglesSpec pins the parity; the chain's higher-order lambdas
    * evaluate interpreted, the same cost class MinHashSig eliminated). */
  def shingles(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.ShingleArray.ofColumn(col(textCol), k)).as("shingle"))

  // ---- n-gram Jaccard ----------------------------------------------------

  /** Pairwise n-gram Jaccard over an inverted shingle index: only pairs
    * sharing ≥1 shingle are generated (the standard scalable formulation —
    * no cross join). Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard ≥ threshold. `maxDf` drops ubiquitous shingles (both a noise
    * and a skew guard: a shingle shared by f docs generates f² pairs). */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      maxDf: Int = 1000): DataFrame = {
    val sh = shingles(docs, k, idCol, textCol)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val filtered = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("df") <= maxDf).drop("df")
    val common = filtered.as("a").join(filtered.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("common").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("common")).cast(DoubleType), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Snapshot diff between two corpus versions: one row per doc_id that
    * exists in either side, with status `added` (new only), `removed`
    * (old only), `changed` (both, content fingerprint differs), or
    * `unchanged`. The audit step an incremental 100 TB pipeline runs
    * between crawls before deciding what to re-process — content
    * equality by [[TextAnalysis.fingerprint]] (whitespace-normalized
    * md5), never by byte-comparing text across the join. One full outer
    * hash join on the id; only (id, fingerprint) pairs shuffle. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    // explicit presence markers: a null-TEXT doc has a null fingerprint,
    // which must not read as "row absent" in the outer join
    val o = oldDocs.select(col(idCol).as("__id"), fp.as("__ofp"), lit(1).as("__op"))
    val n = newDocs.select(col(idCol).as("__id"), fp.as("__nfp"), lit(1).as("__np"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__op").isNull, lit("added"))
          .when(col("__np").isNull, lit("removed"))
          // null-safe: two null-text docs are content-equal
          .when(col("__ofp") <=> col("__nfp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** ceil(threshold · n) WITHOUT float crossing (ADVICE r6): the double
    * product can round up past an exactly-integral value (0.82·100 →
    * 82.00000000000001 → ceil 83), silently shortening the prefix by one
    * and breaking the EXACT-pair-set guarantee. The threshold is floor-
    * quantized to 6 decimals (t' = ⌊t·10⁶⌋/10⁶ ≤ t, so the computed
    * ceiling can only drop and the prefix only LENGTHEN — recall-safe;
    * exact whenever t is a ≤6-decimal literal, i.e. every practical
    * threshold), then ceil(t'·n) = ⌊(t'ₙᵤₘ·n + 10⁶−1)/10⁶⌋ in integer
    * arithmetic — the numerator stays far below 2⁵³ for any real
    * per-document shingle count, so the double division is exact. */
  private[graft] def ceilMulExact(threshold: Double, n: Column): Column = {
    val tNum = math.floor(threshold * 1e6).toLong
    ((lit(tNum) * n + lit(999999L)) / lit(1000000L)).cast(LongType)
  }

  /** Exact Jaccard similarity self-join with PREFIX FILTERING (AllPairs /
    * PPJoin, Bayardo et al. WWW'07) — the scale path past the plain
    * inverted index above: two documents with Jaccard ≥ t must share at
    * least one shingle among each one's (n − ⌈t·n⌉ + 1) RAREST shingles
    * under any common global shingle order, so only PREFIX occurrences
    * enter the candidate join instead of every posting. Rare-first
    * ordering makes those prefix postings the low-df ones — the candidate
    * fanout collapses exactly where the plain index explodes (hot
    * shingles sit in nobody's prefix unless a doc is nearly all stopword
    * soup), and no recall-losing `maxDf` cap is needed: the result is the
    * EXACT pair set at the threshold.
    *
    * The global order is the (df', shingle-hash) pair itself — an order
    * KEY needs no global rank assignment, and df' comes from a BROADCAST
    * hot-vocabulary map, so per-doc prefixes are selected IN-ROW and the
    * full posting relation never reaches an exchange (inline comments
    * below give the shuffle accounting). Verification joins candidate
    * pairs to the two per-doc hashed shingle arrays and intersects
    * in-row; the ≥ t decision is exact integer cross-multiplication.
    * Returns (id_a, id_b, jaccard) like [[ngramJaccardPairs]].
    *
    * Hot-shingle posture (VERDICT r6 asked for a df-capped candidate
    * join; the cap is PROVABLY REDUNDANT here, so this documents why
    * instead of shipping dead machinery): both join sides are already
    * prefix-restricted, and a doc with a hot (high-df) shingle in its
    * prefix is by definition a doc whose rarer shingles could not fill
    * the prefix — near-pure boilerplate ("stopword soup"). Any candidate
    * pair meeting on a hot prefix shingle therefore consists of TWO such
    * soup docs, so a "cap hot postings + rescue-join the hot-prefix docs
    * against each other" scheme regenerates exactly the pairs it capped:
    * the candidate volume attributable to hot shingles is |soup docs|²
    * with or without the cap, and in the truly degenerate near-identical
    * corpus the TRUE OUTPUT is itself quadratic — no recall-complete
    * candidate scheme beats it (exact-dedup-first remains the documented
    * upstream answer; RetrievalSpec pins the degenerate case stays
    * exact). What DOES cut candidate volume without losing recall is
    * PPJoin's POSITIONAL filter, implemented below: a matched prefix
    * occurrence at ranks (pa, pb) of docs sized (na, nb) bounds the
    * overlap by 1 + min(na − pa, nb − pb), and the pair needs overlap
    * ≥ α = ⌈t/(1+t)·(na+nb)⌉ — for the π-SMALLEST shared shingle the
    * bound is tight enough that true pairs always pass (every other
    * shared element ranks after it in both docs), while boilerplate
    * pairs meeting only DEEP in both prefixes are pruned before the
    * distinct/verify stages ever see them. α uses the floor-quantized
    * threshold (α' ≤ α — pruning with a smaller floor is always
    * recall-safe). */
  def prefixJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      /** Hot-vocabulary budget for the broadcast df map (see below).
        * Kept small on purpose: the TakeOrdered that selects the map
        * merges `#partitions × cap` rows on the driver, and every
        * shingle OUTSIDE the map costs only candidate-pruning quality
        * (treated as df = 1), never recall. */
      hotVocabCap: Int = 1 << 16,
      /** Blocking-collapse guard (r9): refuse when the estimated
        * candidate volume exceeds `maxCandidateBlowup` × the corpus's
        * total shingle mass. Prefix filtering presumes a shingle
        * vocabulary ≫ corpus size (the AllPairs/PPJoin premise, true of
        * any real web corpus) — on vocabulary-EXHAUSTED data (measured:
        * a 31-token test corpus whose ~30K possible 3-gram shingles all
        * go hot) no shingle is rare, candidates are birthday-quadratic
        * chance collisions (19.7M candidates at 50K docs for ZERO true
        * pairs), and the join wedges a node before producing anything.
        * The estimate is driver-side FREE: Σ (df/p)²/2 over the already
        * collected sampled-df map (sample rate p) — an order-of-magnitude
        * detector, exact enough to separate ~linear (a few × shingle
        * mass) from collapsed (50×+). Use [[minHashLshPairs]] on such
        * corpora (banded + capped buckets, measured linear across two
        * decades). */
      maxCandidateBlowup: Double = 50.0): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"prefixJaccardPairs threshold $threshold must be in (0, 1]")
    // Full postings NEVER shuffle (the r6 form shuffled the exploded
    // (doc, shingle-string) relation three times — df window, per-doc
    // window, collect_set — ~90 GB at the 100× probe point, which filled
    // local disk before the candidate join even ran). Instead:
    //  1. shingle arrays stay IN-ROW, hashed to 64-bit (xxhash64) — the
    //     only full-posting explode feeds a map-side partial COUNT over
    //     longs, so the df shuffle is per-partition-distinct vocab;
    //  2. the rare-first order comes from a BROADCAST map of the df≥2
    //     vocabulary (capped at `hotVocabCap` hottest, logged if it
    //     truncates): order key o(h) = (df'(h), h) with df'(h) = 1 for
    //     anything outside the map. ANY total order common to both join
    //     sides keeps the prefix + positional filters recall-complete —
    //     df is purely a candidate-minimization heuristic, and shingles
    //     below the cap have near-floor df anyway, so the pruning loss
    //     from truncation is marginal while correctness never depends
    //     on the cap;
    //  3. per-doc sort + prefix slice happen in-row (one deterministic
    //     UDF over the hashed array — a broadcast-map lookup inside an
    //     array sort has no built-in form); only PREFIX postings, as
    //     16-byte hashed rows, ever reach an exchange;
    //  4. verification intersects the per-doc HASHED arrays. Exactness
    //     is therefore modulo 64-bit shingle-hash collisions: for a
    //     V-shingle vocabulary the expected collision count is V²/2⁶⁵
    //     (~0.03 at V = 10⁹ — zero in practice at any tested scale, and
    //     the driver oracle's string-exact ground truth has hash-matched
    //     every run since the switch).
    // Measured trade at sf0.1 (stage decomposition): tokenize+checkpoint
    // 2.5 s, sampled df 0.6, prefix 0.3, candidate join 1.4, verify 0.9
    // ≈ 5.7 s vs the r6 window plan's 3.6 s — the +2 s is materialization
    // barriers replacing posting-volume shuffles, bought back a thousand
    // times over once posting volume outgrows cluster shuffle capacity
    // (the r6 plan moved ~90 GB at the 100× probe point and died; this
    // one moves prefix postings + two array-table joins only). The
    // tokenize+hash stage was then recut from 2.5 s to ~0.5 s by the
    // compiled ShingleHashes kernel (the per-shingle HOF lambdas
    // evaluated interpreted — the MinHashSig lesson applied here):
    // entry median 5.8 → 3.9 s, recouping most of the r6→r7 regression
    // while keeping the 100×-robust shape.
    // Materialized ONCE: with no exchange left in the shingle pipeline
    // there is no ReusedExchange point, so without this the tokenize +
    // shingle + hash work would re-run for every consumer (df job, both
    // candidate-join sides, both verify sides — measured ~3× the total).
    // The operator is already eager — the hot-df map collect below forces
    // a pass regardless — so the checkpoint costs one corpus-sized
    // (id, array<long>) materialization, reused by all five readers.
    val arr = docs.select(col(idCol).as("id"),
        graft.functions.ShingleHashes.ofColumn(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    // df from a 10% document sample: a mostly-unique vocabulary makes the
    // exact-df aggregation vocabulary-sized (its partial agg reduces
    // nothing), yet the map only needs the shingles hot enough to matter
    // for ordering — and a shingle hot in the corpus is hot in a sample.
    // Sampling is deterministic (fixed seed over the checkpoint's fixed
    // partitioning), and a missed/extra hot entry shifts only candidate
    // volume, never the verified output.
    val dfSampleRate = 0.1
    val dfAgg = arr.sample(withReplacement = false, dfSampleRate, seed = 421017L)
      .select(explode(col("sh")).as("shh"))
      .groupBy("shh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2L)
    val hotRows = dfAgg.orderBy(col("df").desc, col("shh").asc)
      .limit(hotVocabCap + 1).collect()
    if (hotRows.length > hotVocabCap)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"prefixJaccardPairs: df map truncated " +
        s"at $hotVocabCap entries; candidate pruning degrades gracefully, " +
        "recall is unaffected")
    val hotMap = hotRows.take(hotVocabCap)
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // blocking-collapse guard (see the parameter doc): candidate volume
    // ≈ Σ C(df,2) over the vocabulary, estimated from the sampled df map
    // already on the driver (df_full ≈ df_sample/p); compared against the
    // corpus's total shingle mass (one narrow agg over the checkpointed
    // array table). Hot shingles dominate Σdf² — the 64K cap loses only
    // the near-floor tail, and on collapsed corpora the whole vocabulary
    // fits under the cap anyway.
    if (hotMap.nonEmpty) {
      val sampleRate = dfSampleRate
      // unbiased under Bernoulli thinning: E[df_s·(df_s−1)] = p²·df·(df−1),
      // so df_s(df_s−1)/p² estimates df² without the +df/p squaring bias;
      // (1−t)² accounts for only the per-doc prefix (≈(1−t)·n shingles)
      // reaching the candidate join on both sides
      val prefixFrac = 1.0 - threshold
      val estCand = hotMap.values.iterator.map { d =>
        prefixFrac * prefixFrac * d.toDouble * (d - 1).toDouble /
          (2.0 * sampleRate * sampleRate)
      }.sum
      val shingleMass = arr.agg(sum(size(col("sh")))).head().getLong(0).toDouble
      // the 5e7 floor keeps the guard a SCALE protection: below ~50M
      // estimated candidates the exact join finishes anywhere, however
      // collapsed the vocabulary (deliberately-degenerate spec corpora
      // and sf0.1-class runs stay untouched)
      if (estCand > math.max(maxCandidateBlowup * shingleMass, 5e7)) {
        // r12 (VERDICT r11 item 8): a PROVABLE health bound lets a
        // clean-but-flagged corpus skip the vocabulary-sized exact-df
        // shuffle below. Every repeated shingle contributes ≥ 2 of the
        // M = Σdf total occurrences, so with V = |vocabulary|:
        // repeated ≤ M − V, hence repeatedFrac ≤ M/V − 1. V is estimated
        // with approx_count_distinct (one narrow scan, constant-size HLL
        // sketch — no shuffle of the vocabulary) and lower-bounded by a
        // 3σ margin (rsd 2% → 6%), so the bound only ever OVERSTATES the
        // repeated fraction: when even the overstated bound clears the
        // 0.5 exhaustion line, the exact aggregation would have decided
        // "healthy, proceed" too, and is skipped. A corpus the bound
        // cannot clear still reaches the exact check unchanged — the
        // refusal fixture fires exactly as before (spec-pinned).
        val vApprox = arr.select(explode(col("sh")).as("shh"))
          .agg(approx_count_distinct(col("shh"), 0.02)).head().getLong(0)
        val vLow = vApprox.toDouble * 0.94
        val healthBound = if (vLow > 0.0) shingleMass / vLow - 1.0
          else Double.PositiveInfinity
        if (healthBound <= 0.5) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            f"prefixJaccardPairs: hot-shingle mass is high (est. candidates " +
            f"${estCand}%.3g > $maxCandidateBlowup%.0f x shingle mass " +
            f"${shingleMass}%.3g) but the vocabulary is provably healthy " +
            f"(repeated fraction ≤ ${healthBound * 100}%.0f%% by the mass/" +
            "distinct bound) — rare-first ordering keeps hot shingles out " +
            "of prefixes, proceeding with the exact join")
        } else {
        // Σdf² alone over-counts: rare-first ordering keeps hot shingles
        // out of prefixes whenever a doc has enough RARE shingles to fill
        // its prefix, so a healthy corpus with a few boilerplate shingles
        // (df ~10% of docs) never sends those postings to the join even
        // though their (1−t)²·df²/2 term dominates the estimate. The
        // refusal therefore gates on the signal rare-first cannot route
        // around: vocabulary exhaustion — most shingles repeat, so
        // prefixes have no rare shingles to prefer. Computed over the
        // FULL corpus, not the df sample: Bernoulli thinning deflates the
        // repeated fraction quadratically (a df=2 shingle survives as
        // repeated w.p. p²≈0.01 at p=0.1), so an exhausted corpus
        // dominated by moderate-df shingles would read ~0 in the sample
        // and FALSELY PASS into the quadratic join this guard exists to
        // refuse (ADVICE r10). The exact-df agg is vocabulary-sized, but
        // this branch only runs on corpora estCand already flagged —
        // the extra full agg is bounded by suspicion, and refusing or
        // proceeding correctly is worth one shuffle here.
        val vs = arr
          .select(explode(col("sh")).as("shh"))
          .groupBy("shh").agg(count(lit(1)).as("df"))
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("df") >= 2L, 1L).otherwise(0L)).as("repeated")).head()
        val vocab = vs.getLong(0)
        val repeatedFrac =
          if (vocab == 0L) 0.0 else vs.getLong(1).toDouble / vocab.toDouble
        // exact fraction: healthy corpora (mostly-unique shingles) read
        // ~0 and pass untouched; > 0.5 certifies genuine exhaustion.
        require(repeatedFrac <= 0.5 || estCand <= math.max(
            maxCandidateBlowup * shingleMass, 5e7),
          f"prefixJaccardPairs: estimated candidate volume ${estCand}%.3g exceeds " +
          f"$maxCandidateBlowup%.0f x the corpus shingle mass (${shingleMass}%.3g) " +
          f"and ${repeatedFrac * 100}%.0f%% of the shingle vocabulary " +
          "repeats — the vocabulary is exhausted (no shingle is rare), so the " +
          "candidate join would be quadratic chance collisions. Use " +
          "minHashLshPairs (banded + capped buckets) on this corpus, or raise " +
          "maxCandidateBlowup to force the exact join.")
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          f"prefixJaccardPairs: hot-shingle mass is high (est. candidates " +
          f"${estCand}%.3g > $maxCandidateBlowup%.0f x shingle mass " +
          f"${shingleMass}%.3g) but the vocabulary is healthy " +
          f"(${repeatedFrac * 100}%.0f%% repeated) — rare-first ordering keeps " +
          "hot shingles out of prefixes, proceeding with the exact join")
        }
      }
    }
    val hotB = docs.sparkSession.sparkContext.broadcast(hotMap)
    // Per-doc order-and-slice, primitive-sorted: shingles outside the hot
    // map all carry df' = 1, so they order among themselves by hash alone
    // (one unboxed Arrays.sort); only the doc's HOT shingles (usually a
    // handful) pay a boxed (df, h) sort. A single tuple-keyed sortBy over
    // the whole array measured ~3× slower end-to-end at sf0.1.
    val prefixUdf = udf((sh: Seq[Long], pfxLen: Int) => {
      val m = hotB.value
      val rare = Array.newBuilder[Long]
      var hot = List.empty[(Long, Long)]
      sh.foreach { h =>
        m.get(h) match {
          case Some(d) => hot = (d, h) :: hot
          case None => rare += h
        }
      }
      val r = rare.result(); java.util.Arrays.sort(r)
      val out = new Array[Long](math.min(pfxLen, sh.length))
      var i = 0
      while (i < out.length && i < r.length) { out(i) = r(i); i += 1 }
      val hs = hot.sorted.iterator
      while (i < out.length) { out(i) = hs.next()._2; i += 1 }
      out
    })
    val prefix = arr
      .withColumn("n_sh", size(col("sh")).cast(LongType))
      .withColumn("pfx", prefixUdf(col("sh"),
        (col("n_sh") - ceilMulExact(threshold, col("n_sh")) + 1).cast(IntegerType)))
      .select(col("id"), col("n_sh"), posexplode(col("pfx")))
      .select(col("id"), col("n_sh"), (col("pos") + 1).cast(LongType).as("pos"),
        col("col").as("shh"))
    // AllPairs size filter rides the candidate join: J(A,B) ≤ min/max of
    // the set sizes, so J ≥ t already implies t·|A| ≤ |B| ≤ |A|/t —
    // incompatible-size pairs are pruned before they exist (safe: only
    // pairs the threshold test would reject anyway)
    val tNum = math.floor(threshold * 1e6).toLong
    // α' = ⌈t'·(na+nb)/(1+t')⌉ in exact integer arithmetic (t' = tNum/10⁶)
    val alpha = ((lit(tNum) * (col("a.n_sh") + col("b.n_sh")) +
      lit(1000000L + tNum - 1)) / lit(1000000L + tNum)).cast(LongType)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shh") === col("b.shh") && col("a.id") < col("b.id") &&
          col("b.n_sh").cast(DoubleType) >= lit(threshold) * col("a.n_sh") &&
          col("a.n_sh").cast(DoubleType) >= lit(threshold) * col("b.n_sh") &&
          least(col("a.n_sh") - col("a.pos"), col("b.n_sh") - col("b.pos")) +
            lit(1L) >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val sets = arr.select(col("id"), col("sh").as("set"))
    val scored = cand
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("uni", size(col("set_a")) + size(col("set_b")) - col("inter"))
    // exact threshold test in integers: inter/uni >= t  ⇔  inter·D ≥ t·D·uni
    // with t expressed as an exact double times the union (both engines
    // compare the same doubles; no float division enters the DECISION)
    scored.filter(col("inter").cast(DoubleType) >= lit(threshold) * col("uni"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast(DoubleType) / col("uni").cast(DoubleType), 6)
          .as("jaccard"))
  }

  /** Asymmetric CONTAINMENT join: pairs where C(a→b) = |A∩B| / |A| ≥ t —
    * "document a's shingle set is mostly inside b" (quote, excerpt, and
    * copy detection; subset-shaped, so Jaccard misses it whenever b is
    * much larger than a). `contained` is the probe side (the snippets /
    * suspected excerpts), `corpus` the haystack; ids must not clash in
    * meaning — output is (`containedIdCol`, `corpusIdCol`, containment).
    *
    * Prefix filter, one-sided: overlap ≥ ⌈t·|A|⌉ forces at least one of
    * a's (|A| − ⌈t·|A|⌉ + 1) first-by-any-order shingles to hit B —
    * recall-complete for ANY global order because the corpus side stays
    * FULL. The order used is corpus document frequency (rare-first), the
    * choice that minimizes candidate fanout: a probe's prefix joins the
    * corpus posting lists of its RAREST shingles. Verification is the
    * same in-row array intersect as [[prefixJaccardPairs]]; the ≥ t
    * decision never divides. */
  def containmentPairs(contained: DataFrame, corpus: DataFrame, k: Int = 3,
      threshold: Double = 0.9, containedIdCol: String = "probe_id",
      corpusIdCol: String = "doc_id",
      textCol: String = "text",
      /** The probe-vocabulary broadcast is the operator's scale lever,
        * and it presumes the CONTRACT side of the asymmetry: `contained`
        * is snippets/suspected excerpts, orders of magnitude smaller
        * than the haystack. 5M distinct shingle hashes ≈ 40 MB
        * broadcast; beyond that the probe set is not "snippets" and the
        * symmetric [[prefixJaccardPairs]] (or MinHash-LSH) family is the
        * right tool. */
      maxProbeVocab: Long = 5000000L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"containmentPairs threshold $threshold must be in (0, 1]")
    // r9 kernel (the query-bounded posture [[graft.pipeline.Retrieval
    // .bm25TopK]] uses, applied to the containment join): the corpus is
    // NEVER fully shuffled. The old form shuffled the exploded corpus
    // (doc, shingle-string) relation twice — a full-vocabulary df groupBy
    // plus a collect_set rebuild of every document's shingle set — both
    // of which grow with the corpus, not with the probes. Instead the
    // probe vocabulary (bounded by contract, guarded below) broadcasts
    // into an IN-ROW array filter directly behind the corpus-side shingle
    // kernel (r10: formerly a row-exploded broadcast semi-join — see the
    // occB comment for the measured reason), so the corpus-wide work is
    // two narrow scans (one filling the occB checkpoint below, one
    // re-deriving arrays at verify), row expansion only ever happens for
    // PROBE-shingle occurrences, and those survivors are the only
    // shuffled corpus rows. Shingle identity is
    // the same 64-bit xxhash the prefix-Jaccard kernel verifies with
    // (exactness modulo V²/2⁶⁵ hash collisions — hash-matched against the
    // string-exact DuckDB oracle every round since the switch). The
    // rare-first prefix now tie-breaks by hash instead of shingle string:
    // ANY total order keeps the one-sided prefix filter recall-complete
    // (the corpus side stays full), so the verified output is unchanged.
    // probe-sized, read three times (vocab, prefix, verify) — the
    // checkpoint collapses the caller's upstream lineage (a repartition
    // or derivation of the snippet table) to ONE run; the first cut of
    // this kernel left it lazy and the plan replayed that subtree at
    // every use (~10 exchanges, entry 3x slower than the old form)
    val arrA = contained.select(col(containedIdCol).as("pid"),
        graft.functions.ShingleHashes.ofColumn(col(textCol), k).as("sha"))
      .filter(size(col("sha")) > 0)
      .localCheckpoint()
    val arrB = corpus.select(col(corpusIdCol).as("id"),
        graft.functions.ShingleHashes.ofColumn(col(textCol), k).as("shb"))
      .filter(size(col("shb")) > 0)
    // the probe vocabulary is guard-bounded; collect it once. The collect
    // is CAPPED at maxProbeVocab+1 rows, so a misuse the guard exists to
    // refuse (a corpus-sized probe side, tens of millions of distinct
    // hashes) fails the require without ever shipping the oversized
    // vocabulary to the driver — the distinct still executes on the
    // executors, but only cap+1 rows cross the wire.
    val vocabRows = arrA.select(explode(col("sha")).as("shh")).distinct()
      .limit(math.min(maxProbeVocab + 1L, Int.MaxValue.toLong).toInt).collect()
    require(vocabRows.length <= maxProbeVocab,
      s"containmentPairs: probe vocabulary exceeds " +
      s"maxProbeVocab $maxProbeVocab — the probe side is supposed to be " +
      "snippets (the broadcast-prune contract); for symmetric " +
      "corpus-vs-corpus joins use prefixJaccardPairs or minHashLshPairs, " +
      "or raise maxProbeVocab.")
    // corpus occurrences of probe shingles, pruned IN-ROW before any row
    // expansion: each document's shingle array is filtered against the
    // broadcast vocabulary by the compiled [[SortedVocabFilter]] kernel
    // (sorted long[] + binary search, primitive in and out — the r10 UDF
    // form boxed every Seq[Long] element) and only the SURVIVORS explode
    // into rows. The
    // r9 form exploded the full corpus (one (id, shingle) row per corpus
    // shingle) into a broadcast LeftSemi; the Generate of those ~M rows —
    // nearly all of which the semi-join immediately discarded — was the
    // measured wall on a realistic wide-vocabulary corpus (cont-probe at
    // the 100× Zipf corpus: 60M-row explode 213 s, corpus scan itself
    // 4.6 s), since a generator row costs allocation whether or not it
    // survives. Filter-then-explode produces the identical occurrence
    // set with row expansion proportional to the QUERY-bounded survivors.
    // The LAZY checkpoint serves both readers (dfB and the candidate
    // join) from one corpus pass; lazy (not eager) because the vocab
    // collect above already paid the driver barrier — no extra job.
    val vocabSorted: Array[Long] = {
      val a = vocabRows.map(_.getLong(0)); java.util.Arrays.sort(a); a
    }
    val vocabB = contained.sparkSession.sparkContext.broadcast(vocabSorted)
    val occB = arrB
      .select(col("id"), explode(
        graft.functions.SortedVocabFilter.ofColumn(col("shb"), vocabB)).as("shh"))
      .localCheckpoint(eager = false)
    // df per PROBE shingle only (shingle arrays are distinct per doc, so
    // count = document frequency); probe shingles absent from the corpus
    // fall out of occB and carry df 0 through the left_outer — harmless
    // for recall (any order is complete) and they join no postings anyway
    val dfB = occB.groupBy("shh").agg(count(lit(1)).as("df"))
    val perProbe = Window.partitionBy("pid").orderBy(col("df").asc, col("shh").asc)
    val prefix = arrA
      .select(col("pid"), size(col("sha")).cast(LongType).as("n_sh"),
        explode(col("sha")).as("shh"))
      .join(dfB, Seq("shh"), "left_outer")
      .na.fill(0L, Seq("df"))
      .withColumn("pos", row_number().over(perProbe))
      .filter(col("pos") <= col("n_sh") - ceilMulExact(threshold, col("n_sh")) + 1)
      .select("pid", "shh")
    val cand = prefix.join(occB, Seq("shh"))
      .select("pid", "id").distinct()
    // verification intersects the in-row hashed arrays — the corpus side
    // re-derives its arrays in the same narrow scan shape rather than
    // materializing a corpus-sized checkpoint for one more reader
    cand.join(arrA.select(col("pid"), col("sha")), "pid")
      .join(arrB.select(col("id"), col("shb")), "id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .filter(col("inter").cast(DoubleType) >= lit(threshold) * size(col("sha")))
      .select(col("pid").as(containedIdCol), col("id").as(corpusIdCol),
        round(col("inter").cast(DoubleType) / size(col("sha")).cast(DoubleType), 6)
          .as("containment"))
  }

  // ---- edit-distance similarity join --------------------------------------

  /** Character-level near-dup pairs within Levenshtein distance
    * `maxDist`, via PassJoin-style segment blocking (Li, Deng & Feng,
    * "PASS-JOIN: A Partition-based Method for Similarity Joins",
    * VLDB 2011) — the character-edit counterpart of the token-level
    * [[prefixJaccardPairs]]: catches typo/OCR/whitespace dups whose
    * shingle sets still look similar but whose byte forms differ by a
    * handful of single-character edits.
    *
    * Blocking: each indexed doc is split into `maxDist + 1` disjoint
    * even segments; by pigeonhole, `maxDist` edits leave at least one
    * segment untouched, and the untouched segment appears in the other
    * doc shifted by at most `maxDist` positions. Candidates are
    * therefore an EQUI-join of (indexed length, segment index, segment
    * text) against probe substrings extracted at the segment's expected
    * position ± `maxDist` — constant fanout per doc
    * ((2d+1)·(d+1)·(2d+1) probe keys, d+1 index keys), never an n²
    * cross join, and recall-complete for the requested radius (the
    * position window is the SUPERSET of PassJoin's multi-match-aware
    * window). Survivors are verified with Spark's banded
    * `levenshtein(l, r, threshold)` — O(d·n) per pair, codegen'd.
    * Docs shorter than `maxDist + 1` chars (empty segments would break
    * the pigeonhole) go through a separate length-bucket equi-join —
    * pairs they participate in can only involve docs of length
    * ≤ 2·maxDist, so that leg is corpus-tiny unless the corpus is
    * degenerate (a flood of near-empty docs belongs to [[exactDedup]],
    * run it first — the same caveat as the other candidate joins).
    *
    * Output: (id_a < id_b, edit_dist ≤ maxDist), one row per pair.
    *
    * Design envelope: ABSOLUTE small radii (d ≲ 8). A normalized
    * threshold (ed ≤ (1−τ)·max(len)) over document-length strings
    * implies d in the tens-to-hundreds, where PassJoin's
    * (d+1)·O(d²) probe fanout explodes — the edit-join literature
    * targets short strings for exactly this reason. Normalized
    * similarity over long documents is the token-set family's job
    * ([[prefixJaccardPairs]] exact, [[minHashLshPairs]] approximate):
    * character edits perturb a bounded number of shingles, so a
    * Jaccard threshold subsumes large-d normalized edit thresholds at
    * corpus scale. */
  def editDistancePairs(docs: DataFrame, maxDist: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist
    val nseg = d + 1
    // id type is PRESERVED through the pair pipeline (ADVICE r7: an
    // earlier cast-to-long turned string doc ids into nulls, so the
    // candidate joins matched nothing and the operator silently returned
    // empty) — least/greatest and the equi-joins below only need an
    // orderable type, which every Spark atomic type is.
    val base = docs.select(col(idCol).as("id"),
      col(textCol).as("t"), length(col(textCol)).cast(IntegerType).as("len"))
    // products stay < 2^31 (i ≤ d+1, l = a string length), so the
    // floor-of-double division is exact
    def segStart(i: Column, l: Column): Column =
      floor(i.cast(DoubleType) * l / nseg).cast(IntegerType)

    // index side: the d+1 disjoint even segments of every long-enough doc
    val idx = base.filter(col("len") >= nseg)
      .select(col("id").as("id_s"), col("t").as("t_s"), col("len").as("len_s"),
        explode(transform(sequence(lit(0), lit(d)), i => {
          val p = segStart(i, col("len"))
          val e = segStart(i + 1, col("len"))
          struct(i.cast(IntegerType).as("i"),
            col("t").substr(p + 1, e - p).as("seg"))
        })).as("x"))
      .select(col("id_s"), col("t_s"), col("len_s"),
        col("x.i").as("i"), col("x.seg").as("seg"))

    // probe side: only the LONGER side probes (a pair of unequal lengths
    // is found exactly once, probing the longer against the shorter's
    // segments; equal lengths are de-duped by id in the join), so the
    // candidate indexed lengths are l ∈ [len−d, len] ∩ [nseg, ∞). The
    // position window is PassJoin's tight multi-match-aware one: an
    // untouched segment's start shift δ obeys |δ| ≤ e_pre and
    // |δ − Δ| ≤ e_post with e_pre + e_post ≤ d (Δ = len_r − l), i.e.
    // |δ| + |δ − Δ| ≤ d — (d−|Δ|+1)-wide instead of 2d+1, and still
    // recall-complete. Together: ≤ (d+1)·(d+1)(d+2)/2 probe keys per doc
    // (75 at d=4, vs 405 for the loose two-sided window).
    val lengths = when(col("len") >= nseg,
        sequence(greatest(col("len") - d, lit(nseg)), col("len")))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val probe = base
      .select(col("id").as("id_r"), col("len").as("len_r"),
        explode(flatten(flatten(transform(lengths, l =>
          transform(sequence(lit(0), lit(d)), i => {
            val p = segStart(i, l)
            val segLen = segStart(i + 1, l) - p
            val bigDelta = col("len") - l
            transform(sequence(lit(-d), lit(d)), delta => {
              val s = p + delta
              when(abs(delta) + abs(delta - bigDelta) <= d &&
                  s >= 0 && s + segLen <= col("len") && segLen > 0,
                struct(l.as("l"), i.cast(IntegerType).as("i"),
                  col("t").substr(s + 1, segLen).as("seg")))
                .otherwise(lit(null))
            })
          }))))).as("k"))
      .filter(col("k").isNotNull)
      .select(col("id_r"), col("len_r"),
        col("k.l").as("l"), col("k.i").as("i"), col("k.seg").as("seg"))
    // ids-only candidates: texts join back AFTER pair dedup, so the
    // shuffle carries (id, id) rows, not documents
    val longCand = probe.join(idx.drop("t_s"),
        probe("l") === idx("len_s") && probe("i") === idx("i") &&
          probe("seg") === idx("seg") &&
          (col("len_s") < col("len_r") || col("id_r") > col("id_s")))
      .select(col("id_r"), col("id_s"))

    // short leg: indexed docs of length < nseg block on exact length
    // pairs (|Δlen| ≤ d is necessary for ed ≤ d) — an equi-join on the
    // candidate length, no cartesian
    val shortIdx = base.filter(col("len") < nseg)
      .select(col("id").as("id_s"), col("len").as("len_s"))
    val shortLens = when(col("len") - d <= nseg - 1,
        sequence(greatest(col("len") - d, lit(0)), least(col("len") + d, lit(nseg - 1))))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val shortProbe = base
      .select(col("id").as("id_r"), explode(shortLens).as("l"))
    val shortCand = shortProbe.join(shortIdx,
        col("l") === col("len_s") && col("id_r") =!= col("id_s"))
      .select(col("id_r"), col("id_s"))

    val pairs = longCand.unionByName(shortCand)
      .select(least(col("id_r"), col("id_s")).as("id_a"),
        greatest(col("id_r"), col("id_s")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(base.select(col("id").as("id_a"), col("t").as("t_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("t").as("t_b")), "id_b")
      .withColumn("edit_dist", levenshtein(col("t_a"), col("t_b"), d).cast(LongType))
      .filter(col("edit_dist") >= 0) // banded levenshtein: −1 = over budget
      .select("id_a", "id_b", "edit_dist")
  }

  // ---- MinHash + LSH ------------------------------------------------------

  /** Hash families (both evaluated by the compiled
    * [[graft.functions.MinHashSig]] kernel): default = xxhash64 with
    * per-seed prefixes; portable = ONE md5-60 base hash per shingle,
    * then the classic universal-hash permutations
    * h_i = (a_i·(h mod p) + b_i) mod p over the Mersenne prime p = 2³¹−1
    * — 32 cheap integer ops instead of 32 digests (the all-md5 variant
    * measured 11.9 s at sf0.1 vs ~1.5 s for this construction), and
    * DuckDB reproduces every step closed-form (products stay < 2⁶², no
    * BIGINT overflow). xxhash64 stays the throughput default. */
  private[pipeline] val MhPrime = 2147483647L // 2^31 - 1

  /** Deterministic (a_i, b_i) pairs, md5-derived so both engines can
    * hard-code them; a_i ∈ [1, p−1], b_i ∈ [0, p−1]. */
  private[graft] def mhCoeffs(i: Int): (Long, Long) = {
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    (Math.floorMod(h(s"mh-a-$i"), MhPrime - 1) + 1, Math.floorMod(h(s"mh-b-$i"), MhPrime))
  }

  /** MinHash signatures: (id, sig: array<long>) with `numHashes` mins,
    * computed per row by the compiled [[graft.functions.MinHashSig]]
    * kernel — NO shuffle (the earlier explode + partial-agg form
    * shipped one 32-long row per (doc, reducer) through an exchange and
    * still paid per-shingle expression eval; A/B at sf0.1, 32-way:
    * kernel 0.2-1.0 s vs explode+agg 2.6-3.0 s best-case). An
    * interpreted per-row HOF formulation sits in between design points
    * and was the original streaming leg — measured ~7.5 ms/doc
    * single-core (32 lambda evals per shingle), which is what the
    * kernel replaces. Bit parity of all three formulations is pinned by
    * MinHashSigSpec (the explode form lives on there as the
    * independent reference).
    *
    * Contract: ONE signature row per INPUT row — ids are assumed unique
    * (the corpus invariant every pair operator here shares). A caller
    * with duplicate ids must pre-aggregate (the retired explode+groupBy
    * form happened to union duplicate ids' shingle sets; that was an
    * artifact of its plan, not a supported semantics — downstream
    * banding would see one id with merged shingles, which is neither
    * "first wins" nor "rows kept apart"). Dedup ids first. */
  def minHashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 32,
      idCol: String = "doc_id", textCol: String = "text",
      portableHashes: Boolean = false): DataFrame =
    minHashSignaturesNarrow(docs, k, numHashes, idCol, textCol, portableHashes)
      .select(col(idCol).as("id"), col("sig"))

  /** Shuffle-free MinHash signatures: the same (id, sig) as
    * [[minHashSignatures]] — xxhash64 family — computed per row as
    * `array_min(transform(shingleArray, ...))`, no explode, no
    * aggregation. Slower per core than the explode form (interpreted
    * lambdas), but STATELESS: usable inside a streaming select where an
    * aggregation would demand watermarked state, and in any narrow
    * pipeline stage that must not introduce an exchange. */
  def minHashSignaturesNarrow(docs: DataFrame, k: Int = 3, numHashes: Int = 32,
      idCol: String = "doc_id", textCol: String = "text",
      portableHashes: Boolean = false): DataFrame = {
    // One native expression instead of numHashes × |shingles| interpreted
    // higher-order lambda evaluations: the HOF formulation measured
    // ~7.5 ms/doc single-core at sf0.1 (37 s for 5000 docs — the
    // dominant per-micro-batch cost of the streaming LSH replay), ~100×
    // the compiled kernel. Bit parity with the Column path is pinned by
    // MinHashSigSpec; the `dedup_minhash_stream` DuckDB oracle checks
    // the portable family end-to-end.
    docs.withColumn("sig",
        graft.functions.MinHashSig.ofColumn(col(textCol), k, numHashes, portableHashes))
      .filter(size(col("sig")) > 0)
  }

  /** Band → bucket key, shared by the batch and streaming LSH legs so a
    * replayed feed lands in bit-identical buckets: portable = md5-60
    * over "band:<b>:<sig slice csv>" (DuckDB closed form), default =
    * codegen'd xxhash64 of the slice. */
  private def bandBucketCol(portableHashes: Boolean, rows: Int)(b: Column): Column =
    if (portableHashes)
      md5Hash60(concat(lit("band:"), b.cast(StringType), lit(":"),
        array_join(transform(slice(col("sig"), b * rows + 1, lit(rows)),
          _.cast(StringType)), ",")))
    else xxhash64(lit("band"), b, slice(col("sig"), b * rows + 1, lit(rows)))

  /** LSH candidate pairs: band the signature, bucket-join, estimate
    * similarity as matching-minhash fraction; keep ≥ threshold.
    * bands*rows must equal numHashes. */
  def minHashLshPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      /** Materialize the signature table before pair generation.
        * Re-measured r4 (tools.ScaleProbe): on a well-partitioned corpus
        * checkpoint wins mildly at 1× (warm 1.01 s vs 1.22 s lazy, 5k
        * docs) and at 8× (2.78 s vs 3.17 s, 40k docs); on the raw
        * single-file entry it is a wash (~4.1 s either way — partition
        * count, not recompute, binds). Off by default to keep the
        * operator lazy/composable; the driver entries and any multi-stage
        * scale run should pass true — recompute growth is linear in
        * corpus size while the barrier cost is fixed. */
      checkpointSigs: Boolean = false,
      /** Cap on (band, bucket) membership before the self-join: a bucket
        * of B docs yields B(B−1)/2 candidate pairs, so a flood of
        * byte-identical docs (which belongs to [[exactDedup]] — run it
        * first) would go quadratic here. Oversized buckets keep their
        * `maxBucketSize` smallest ids (deterministic); a dropped doc can
        * still pair through its other bands. None disables. */
      maxBucketSize: Option[Int] = Some(4096),
      portableHashes: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs0 = minHashSignatures(docs, k, numHashes, idCol, textCol, portableHashes)
    val sigs = if (checkpointSigs) sigs0.localCheckpoint() else sigs0
    def bandBucket(b: Column): Column = bandBucketCol(portableHashes, rows)(b)
    // Catalyst has no common-subplan reuse across self-join sides, so the
    // signature pipeline appears twice in the physical plan (lazy mode).
    val bandedAll = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), bandBucket(_))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val banded = maxBucketSize match {
      case Some(cap) =>
        val w = Window.partitionBy("band", "bucket").orderBy("id")
        bandedAll.withColumn("__bn", row_number().over(w))
          .filter(col("__bn") <= cap).drop("__bn")
      case None => bandedAll
    }
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          c => c)).cast(DoubleType) / numHashes, 6))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Per-arrival state of one LSH (band, bucket) cell: the docs whose
    * band signature hashed here and are still inside the horizon, PACKED
    * as a flat long array of stride-(2+numHashes) records
    * `[id, tsMs, sig…]`. Timestamps ride along because EventTimeTimeout
    * alone cannot enforce the horizon — a key that keeps receiving data
    * never times out, so staleness is pruned at arrival time too. The
    * packed layout matters: state is re-encoded on every micro-batch a
    * cell receives data in, and a primitive Array[Long] encodes as one
    * UnsafeArrayData copy, where the earlier List[(Long, Long,
    * Seq[Long])] shape paid a reflective nested-encoder walk per doc. */
  private[pipeline] case class MhBucketState(packed: Array[Long])

  private[pipeline] case class MhArrival(band: Int, bucket: Long, id: Long,
      ts: java.sql.Timestamp, tsMs: Long, sig: Array[Long])

  /** STREAMING MinHash-LSH near-dup pairs over a live document feed —
    * the streaming leg of [[minHashLshPairs]]: per-row narrow signatures
    * ([[minHashSignaturesNarrow]] — no aggregation state), band buckets
    * exploded to (band, bucket) keys, then `flatMapGroupsWithState`
    * keyed by the bucket. Each cell's state is the docs previously
    * hashed into it within the event-time `horizon`; a new arrival
    * emits (id_a, id_b, est_jaccard ≥ threshold) against the stored
    * docs (and its same-micro-batch peers, processed in (ts, id)
    * order), then joins the state. The horizon is enforced twice: docs
    * older than `arrival − horizon` are PRUNED at arrival time (an
    * EventTimeTimeout alone cannot bound a key that keeps receiving
    * data), and idle cells are cleared via EventTimeTimeout once the
    * watermark passes their last arrival + horizon — so memory is
    * bounded by the horizon's bucket-occupancy rate, not the stream's
    * history, the same bound streamingExactDedup gets from
    * dropDuplicatesWithinWatermark.
    *
    * A pair caught by several bands is emitted once per catching band
    * (streaming cannot globally dropDuplicates without a second
    * stateful stage); consumers that need multiplicity-free pairs
    * dedupe downstream. Batch/stream agreement on the pair SET is
    * pinned by StreamingSpec against [[minHashLshPairs]] (uncapped),
    * and the driver entry `dedup_minhash_stream` replays the corpus
    * (portable hashes) against the batch DuckDB oracle.
    *
    * `maxBucketSize` semantics differ from the batch cap (ADVICE r6):
    * once a cell holds `maxBucketSize` docs, LATER arrivals still pair
    * against the stored docs but are not stored themselves — which docs
    * survive is ARRIVAL-ORDER dependent (first-seen wins), unlike the
    * batch cap's deterministic smallest-ids rule. On a hot cell the two
    * legs can therefore disagree on pairs among the capped tail; sizing
    * the cap above the horizon's worst bucket occupancy (or exact-dedup
    * upstream — hot cells are usually byte-dup floods) keeps the legs
    * identical, which is how the parity spec and driver entry run.
    *
    * `portableHashes` selects the md5-60 universal-hash family and the
    * md5 band buckets — bit-identical to the batch portable leg, so a
    * replayed feed is DuckDB-checkable; default stays xxhash64. */
  def streamingMinHashPairs(docs: DataFrame, tsCol: String, horizon: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Int = 4096, portableHashes: Boolean = false): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val horizonMs = graft.streaming.StreamOps.durationSeconds(horizon) * 1000L
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = minHashSignaturesNarrow(docs, k, numHashes, idCol, textCol,
      portableHashes)
    // the watermarked timestamp column must SURVIVE the projection into
    // the stateful operator, or the event-time timeout is rejected
    val banded = sigs.withWatermark(tsCol, horizon)
      .select(col(idCol).cast(LongType).as("id"),
        // no cast: casting mints a fresh attribute WITHOUT the watermark
        // metadata, and the event-time timeout is then rejected
        col(tsCol).as("ts"),
        unix_millis(col(tsCol)).as("tsMs"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => bandBucketCol(portableHashes, rows)(b))))
      .select(col("pos").cast(IntegerType).as("band"), col("col").as("bucket"),
        col("id"), col("ts"), col("tsMs"), col("sig"))
      .as[MhArrival]
    banded.groupByKey(a => (a.band, a.bucket))
      .flatMapGroupsWithState[MhBucketState, (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, arrivals, state: GroupState[MhBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val stride = 2 + numHashes
            // (ts, id) order makes same-micro-batch processing replayable
            val newDocs = arrivals.toArray.sortBy(a => (a.tsMs, a.id))
            val prev = state.getOption.map(_.packed).getOrElse(Array.emptyLongArray)
            val work = java.util.Arrays.copyOf(prev,
              prev.length + newDocs.length * stride)
            var n = prev.length / stride
            // minTs makes the per-arrival horizon prune O(1) when nothing
            // is stale (the common case) instead of a full-cell scan
            var minTs = Long.MaxValue
            var i = 0
            while (i < n) { minTs = math.min(minTs, work(i * stride + 1)); i += 1 }
            val out = Seq.newBuilder[(Long, Long, Double)]
            var maxTs = Long.MinValue
            newDocs.foreach { a =>
              maxTs = math.max(maxTs, a.tsMs)
              val cutoff = a.tsMs - horizonMs
              if (minTs < cutoff) { // compact the live prefix in place
                var r = 0; var w = 0; var newMin = Long.MaxValue
                while (r < n) {
                  val ts = work(r * stride + 1)
                  if (ts >= cutoff) {
                    if (w != r) System.arraycopy(work, r * stride, work, w * stride, stride)
                    newMin = math.min(newMin, ts); w += 1
                  }
                  r += 1
                }
                n = w; minTs = newMin
              }
              var dup = false; var j = 0
              while (j < n && !dup) { if (work(j * stride) == a.id) dup = true; j += 1 }
              if (!dup) {
                val asig = a.sig
                var d = 0
                while (d < n) {
                  val off = d * stride
                  var m = 0; var h = 0
                  while (h < numHashes) { if (work(off + 2 + h) == asig(h)) m += 1; h += 1 }
                  val est = m.toDouble / numHashes
                  if (est >= threshold) {
                    val oid = work(off)
                    out += ((math.min(oid, a.id), math.max(oid, a.id),
                      math.rint(est * 1e6) / 1e6))
                  }
                  d += 1
                }
                if (n < maxBucketSize) {
                  val off = n * stride
                  work(off) = a.id; work(off + 1) = a.tsMs
                  System.arraycopy(asig, 0, work, off + 2, numHashes)
                  n += 1
                  minTs = math.min(minTs, a.tsMs)
                }
              }
            }
            state.update(MhBucketState(java.util.Arrays.copyOf(work, n * stride)))
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b", "est_jaccard")
  }

  // ---- SimHash ------------------------------------------------------------

  /** Cross-engine-portable 60-bit token hash: the first 15 hex digits of
    * md5, parsed base-16 — DuckDB computes the identical value with
    * `('0x' || substr(md5(t), 1, 15))::BIGINT`, which is what lets the
    * driver oracle-check the SimHash pipeline end-to-end. xxhash64 stays
    * the default for throughput (no hex round-trip). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** 64-bit SimHash over token hashes: per-bit majority vote of hashed
    * tokens (default xxhash64). Near-dups = signatures within `maxHamming`. */
  def simHashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val h = hashFn(col("tok"))
    // per-bit contribution: +1 if bit set else -1; sum > 0 → bit set
    val aggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
    }
    tok.withColumn("h", h).groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_.bitwiseOR(_)).as("simhash"))
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs via segment blocking: the 64-bit signature is
    * split into `maxHamming + 1` near-equal segments, so by pigeonhole any
    * pair within `maxHamming` bit flips shares at least one identical
    * segment — candidate generation is recall-complete for the requested
    * radius and stays linear in practice instead of n². */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      hashFn: Column => Column = xxhash64(_)): DataFrame =
    hammingPairs64(simHashSignatures(docs, idCol, textCol, hashFn)
      .select(col("id"), col("simhash").as("sig")), maxHamming)

  /** Hamming-ball pair join over ANY 64-bit signature column — the
    * segment-blocking core shared by [[simHashPairs]] (text) and
    * [[Multimodal.dHashPairs]] (images): `sigs` is (id, sig); the
    * signature is split into `maxHamming + 1` near-equal bit segments,
    * so by pigeonhole any pair within `maxHamming` bit flips shares at
    * least one identical segment — candidate generation is
    * recall-complete for the requested radius through plain equi-joins
    * on (segment index, segment value), linear in practice instead of
    * n². Returns (id_a, id_b, hamming) with id_a < id_b, exact hamming
    * ≤ `maxHamming`. */
  private[pipeline] def hammingPairs64(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nSegs = maxHamming + 1
    val widths = Array.tabulate(nSegs)(i => 64 / nSegs + (if (i < 64 % nSegs) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def segment(i: Int): Column = {
      val mask = if (widths(i) >= 64) -1L else (1L << widths(i)) - 1
      shiftright(col("sig"), offsets(i)).bitwiseAND(lit(mask))
    }
    val seg = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until nSegs).map(segment): _*)))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    seg.as("a").join(seg.as("b"),
        col("a.seg") === col("b.seg") && col("a.segval") === col("b.segval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sh_a"), col("b.sig").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---- near-dup clustering ------------------------------------------------

  /** Connected components over a near-dup pair list: every document gets
    * `cluster_id` = the minimum doc id reachable through pairs (its own id
    * when unpaired), plus the cluster size — the step that turns pairwise
    * near-dup evidence into dedup groups with a deterministic survivor
    * (the min id).
    *
    * Min-label propagation, NOT pairwise reachability: state is one label
    * per node and each round shuffles O(|E|) — an all-pairs closure would
    * be quadratic in component size (a k-document duplicate cluster has
    * k² reachable pairs and its closure self-join k³ intermediates), which
    * is exactly the blow-up a 100 TB dedup must avoid. Rounds are bounded
    * by component diameter; near-dup components are near-cliques
    * (LSH/threshold pairs), so real corpora settle in 2-3 rounds. */
  def nearDupClusters(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val fwd = pairs.select(col("id_a").as("v"), col("id_b").as("u"))
    val edges = fwd.unionByName(
        fwd.select(col("u").as("v"), col("v").as("u")))
      .distinct().localCheckpointSevered()
    // labels start at min(self, direct neighbors); each round pulls the
    // smallest label visible one hop away, until no label changes.
    // r12 convergence check: labels are ids that only ever DECREASE
    // (least of self and neighbors), so Σ lbl strictly decreases iff any
    // label changed — the exact integer sum rides the round checkpoint's
    // own materialization job (graph-components' move), replacing BOTH
    // the separate changed-count action AND its |V|⋈|V| join per round.
    // Non-integral id types keep the old join-count (no caller has one;
    // the fallback keeps the operator total).
    val integralIds = pairs.schema("id_a").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    def ckSum(df: DataFrame): (DataFrame, BigInt) = {
      val (ck, _, s) = org.apache.spark.sql.graft.CheckpointBridge
        .localCheckpointSeveredCountSum(df, sumOrdinal = 1)
      (ck, s)
    }
    val labels0Plan = edges.groupBy("v")
      .agg(least(min(col("u")), col("v")).as("lbl"))
    var (labels, prevSum) =
      if (integralIds) ckSum(labels0Plan)
      else (labels0Plan.localCheckpointSevered(), BigInt(0))
    val maxRounds = 64
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val viaNeighbor = edges.join(labels.select(col("v").as("u"), col("lbl")), "u")
        .groupBy("v").agg(min(col("lbl")).as("nlbl"))
      val nextPlan = labels.join(viaNeighbor, Seq("v"), "left_outer")
        .select(col("v"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      if (integralIds) {
        val (next, nextSum) = ckSum(nextPlan)
        graft.reasoner.Reasoner.unpersistCheckpoint(labels)
        labels = next
        converged = nextSum == prevSum
        prevSum = nextSum
      } else {
        val next = nextPlan.localCheckpointSevered()
        val changed = next.select(col("v"), col("lbl").as("nl"))
          .join(labels, Seq("v")).filter(col("nl") =!= col("lbl")).count()
        graft.reasoner.Reasoner.unpersistCheckpoint(labels)
        labels = next
        converged = changed == 0
      }
      round += 1
      graft.reasoner.Reasoner.maybeReclaimShuffles(round)
    }
    // a component with graph diameter > maxRounds (a long pairwise chain)
    // would otherwise return inconsistent cluster_ids silently, breaking
    // the deterministic min-id survivor contract
    if (!converged) throw new IllegalStateException(
      s"nearDupClusters: min-label propagation did not converge in $maxRounds rounds " +
        "(a near-dup component has diameter > " + maxRounds + "); " +
        "raise the round cap or pre-split the component")
    val labeled = docs.select(col(idCol))
      .join(labels, col(idCol) === col("v"), "left_outer")
      .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster_id"))
    labeled.withColumn("cluster_size",
      count(lit(1)).over(Window.partitionBy("cluster_id")))
  }

  // ---- embedding cosine near-dup ------------------------------------------

  /** Double-precision cosine similarity of two float vectors (sequential
    * fold, oracle-parity with DuckDB list_dot_product). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** SemDedup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): embedding near-dup pairs above `threshold` within
    * each block (a cluster/label/LSH-bucket column — the blocking that
    * keeps candidate generation off n²) are clustered by min-label
    * propagation, and ONE deterministic representative (the min id) per
    * semantic group survives. Returns `(id, cluster_size)` for the
    * survivors — cluster_size 1 marks documents with no semantic dup.
    * Pure composition of [[embeddingNearDupPairs]] (blocked equi-join) and
    * [[nearDupClusters]] (O(|E|)/round label propagation) — both already
    * the shapes that survive 100 TB. */
  def semanticRepresentatives(emb: DataFrame, threshold: Double,
      blockCol: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pairs = embeddingNearDupPairs(emb, threshold, blockCol, idCol, vecCol)
    nearDupClusters(emb, pairs, idCol)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol), col("cluster_size"))
  }

  /** Embedding near-dup pairs above a cosine threshold, blocked by a
    * partition column (e.g. label or an LSH bucket) to avoid n² at scale. */
  /** SemDedup at scale (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): the
    * published recipe verbatim — k-means the embedding space, then
    * near-dup WITHIN each cluster — with NO ground-truth crutch: the
    * blocking structure is the engine-portable
    * [[Similarity.kmeansMicro]] quantizer (md5 seeds, integer
    * micro-unit Lloyd rounds) + [[Similarity.assignIntL2]], so DuckDB
    * replays training, assignment, and the within-cluster cosine pairs
    * CTE-for-CTE (driver entry `dedup_semdedup_kmeans` hash-checks the
    * whole pipeline; `dedup_semantic`'s label-blocked form remains as
    * the oracle of the within-block pairing itself). Cluster-local by
    * DEFINITION — pairs across cell boundaries are out of scope in the
    * published method too, which is precisely what makes it linear:
    * candidate volume is Σ|cell|², bounded by the quantizer, never n².
    *
    * `nClusters` is a CORPUS-SCALE parameter, not a constant: hold
    * expected cell occupancy n/k fixed as the corpus grows (the paper
    * uses k ≈ n/1000-ish at web scale). Measured at the 10× probe
    * corpus (20k vectors): fixed k = 8 costs 46-70 s (cells densified
    * 10× → Σ|cell|² grew 100×; 10× exponent 1.19), k = 80 costs ~10 s
    * — corpus-linear again. The driver entry keeps k = 8 because the
    * DuckDB oracle replays training closed-form with k baked into the
    * CTEs; a deployment sizes k to its corpus. Note the pair SET also
    * (correctly) shrinks with finer cells — the cell IS the method's
    * dedup scope.
    * Output: (cid, id_a < id_b, cos ≥ threshold). */
  /** [[semDedupPairs]] with k sized FROM the corpus: k = ⌈n / targetOccupancy⌉,
    * holding expected cell occupancy fixed as the corpus grows — the
    * configuration that keeps SemDedup corpus-LINEAR (candidate volume
    * Σ|cell|² ≈ n·occupancy when cells stay occupancy-sized, vs growing
    * ∝ n²/k for any fixed k). Measured (VERDICT r7 item 1, then pinned
    * by the r8 Sf100Probe leg): fixed k = 8 ran at 10× exponent 1.19
    * (46-70 s at the 10× corpus — cells densified 10×, Σ|cell|² grew
    * 100×); this scaled-k form returns to ~linear (see SURVEY §6 for
    * the probe's recorded per-decade exponents). The count() that sizes
    * k is one corpus pass — at 100 TB that number usually arrives from
    * table metadata instead; pass an explicit k to [[semDedupPairs]]
    * when it does. Driver entry `dedup_semdedup_scaled` hash-checks
    * this end-to-end (the oracle computes the same k with a scalar
    * subquery — the CTE chain is k-independent, k only enters the seed
    * hash's modulus). */
  def semDedupAutoK(emb: DataFrame, threshold: Double,
      targetOccupancy: Int = 100, iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val n = emb.count()
    val k = math.max(1L, (n + targetOccupancy - 1) / targetOccupancy).toInt
    semDedupPairs(emb, threshold, k, iters, idCol, vecCol)
  }

  /** SemDedup with a HYPERPLANE quantizer — the configuration whose cost
    * stays corpus-linear INCLUDING the quantizer. The k-means forms
    * ([[semDedupPairs]]/[[semDedupAutoK]]) are the published recipe
    * verbatim, but flat Lloyd assignment is O(n·d·k) — with k ∝ n (the
    * occupancy-fixed scaling that keeps the PAIR stage linear) the
    * TRAINING stage turns quadratic in corpus size, which is exactly why
    * web-scale SemDedup deployments quantize approximately (FAISS) rather
    * than run exact Lloyd at full k. Here the cell is a random-hyperplane
    * sign pattern ([[Similarity.lshBuckets]], single band of
    * b = ⌈log₂⌈n/occupancy⌉⌉ bits, the md5-derived dyadic planes the
    * `similarity_lsh_topk` oracle already replays bit-for-bit): signature
    * cost O(n·d·log k), pair candidates Σ|cell|² ≈ n·occupancy — both
    * corpus-linear up to the log factor, the Sf100Probe-pinned exponent.
    * Trade vs k-means cells: hyperplane cells are data-oblivious, so a
    * corpus concentrated in one halfspace yields hotter cells (k-means
    * adapts, LSH doesn't) — same SemDedup semantics per cell either way
    * (the cell IS the method's dedup scope).
    * Output: (cell, id_a < id_b, cos ≥ threshold). */
  def semDedupLshPairs(emb: DataFrame, threshold: Double,
      targetOccupancy: Int = 100, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    graft.functions.CosineSimilarity.register(emb.sparkSession)
    val n = emb.count()
    val cells = math.max(1L, (n + targetOccupancy - 1) / targetOccupancy)
    // smallest b with 2^b >= cells (≥ 1 so the blocking never degenerates
    // to one all-pairs cell); the oracle computes the same b by integer
    // comparison, never floating log2
    val b = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, cells - 1)))
    val cellOf = Similarity.lshBuckets(emb, nPlanes = b, bands = 1, idCol, vecCol, dim)
      .select(col("id"), col("bval").as("cell"))
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(cellOf, "id")
    e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cos",
        round(graft.functions.CosineSimilarity(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.cell").as("cell"), col("a.id").as("id_a"),
        col("b.id").as("id_b"), col("cos"))
  }

  def semDedupPairs(emb: DataFrame, threshold: Double, nClusters: Int = 8,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    graft.functions.CosineSimilarity.register(emb.sparkSession)
    // r11: cell assignment is an in-row argmin against the driver-local
    // centroid matrix (same micro-unit arithmetic/tie-break the oracle
    // replays) — no assignment join, the corpus is scanned once per side
    // of the within-cell pair join
    val cmat = Similarity.kmeansMicroMatrix(emb, nClusters, iters, idCol, vecCol)._1
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.nearestCid(vecCol, cmat).as("cid"))
    e.as("a").join(e.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .withColumn("cos",
        round(graft.functions.CosineSimilarity(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.cid").as("cid"), col("a.id").as("id_a"),
        col("b.id").as("id_b"), col("cos"))
  }

  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
      blockCol: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    graft.functions.CosineSimilarity.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("blk"))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos",
        round(graft.functions.CosineSimilarity(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }
}
