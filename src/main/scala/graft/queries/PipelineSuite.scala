package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Contamination, Dedup, Sampling, Similarity, TextAnalysis}

/** LLM-data-pipeline operator queries over documents/embeddings, each with
  * a DuckDB oracle where the computation is SQL-expressible on both
  * engines with bit-identical results. MinHash/SimHash/IVF rely on Spark
  * xxhash64 / engine-specific plans, so they get rows-only driver checks
  * here and full assertions in the ScalaTest suite (recall vs exact
  * results, superset-of-exact-dups, etc.).
  */
object PipelineSuite {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(docs(s, dir)).select("doc_id", "fp", "group_size")),

    // new-crawl-vs-standing-corpus dedup: docs with id%3==0 arrive, the
    // rest are the corpus; a broadcast Bloom prunes before the exact
    // anti join (result exact — the filter only routes)
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalExactDedup(
        d.filter(col("doc_id") % 3 === 0), d.filter(col("doc_id") % 3 =!= 0),
        expectedItems = 10000L)
    }),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), k = 3, threshold = 0.5)),

    // repartition first: the single-file testdata parquet is ONE input
    // split, and the shingle explode + 32-hash aggregation is the
    // per-row-heavy stage that must start parallel.
    // Output = the pair SET only: its oracle is the PORTABLE md5 replay's
    // pair projection — the driver hash check therefore certifies that
    // the xxhash64 family finds exactly the same verified pairs as the
    // portable family on this corpus (probed equal at sf0.001 and sf0.01,
    // tools.AgreementProbe; the est_jaccard VALUES are signature-derived
    // and family-specific, so they stay out of the projection). A future
    // borderline pair caught by one family's bands only would fail this
    // row loudly — that divergence is exactly what the check exists to
    // surface (VERDICT r9 item 3 closes the former rows-only err).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minHashLshPairs(
        docs(s, dir).repartition(s.sparkContext.defaultParallelism),
        k = 3, numHashes = 32, bands = 8,
        threshold = 0.5, checkpointSigs = true)
        .select("id_a", "id_b")),

    // the SAME banded-LSH pipeline with engine-portable md5-60 hashes:
    // signatures, band buckets, candidate join, and similarity estimate
    // are all reproduced closed-form by DuckDB → full hash check of the
    // LSH shape (the xxhash64 entry above stays the throughput default
    // and a rows-only check)
    "dedup_minhash_lsh_portable" -> ((s, dir) =>
      Dedup.minHashLshPairs(
        docs(s, dir).repartition(s.sparkContext.defaultParallelism),
        k = 3, numHashes = 32, bands = 8,
        threshold = 0.5, checkpointSigs = true, portableHashes = true)),

    // STREAMING LSH leg replay (r7, VERDICT r6 item 8): the corpus fed
    // through the flatMapGroupsWithState bucket state machine in five
    // deterministic micro-batches (ts = epoch + doc_id ms; horizon far
    // beyond the feed span so nothing is pruned; portable hashes) — the
    // emitted pair set, multi-band multiplicity collapsed, must
    // hash-match the SAME DuckDB oracle as the batch portable leg. The
    // driver-side collect here is the REPLAY HARNESS (MemoryStream takes
    // local data by design), not the operator: the state machine itself
    // runs distributed, keyed by (band, bucket).
    "dedup_minhash_stream" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val mem = MemoryStream[(Long, Long, String)]
      // MemoryStream yields ONE partition per addData block, so without
      // this the per-row signature stage runs single-threaded per
      // micro-batch; a real source (Kafka, files) arrives
      // pre-partitioned. 8 partitions, not the session's 32: a
      // 1000-doc micro-batch across 32 partitions measures task
      // scheduling, not the operator (sized-to-batch partitioning is
      // what a real deployment tunes; the state machine is identical at
      // any width). Hash-partitioning by doc_id is deterministic, and
      // the watermark is assigned downstream.
      val feed = mem.toDF().toDF("tms", "doc_id", "text")
        .repartition(8, col("doc_id"))
        .withColumn("ts", timestamp_millis(col("tms")))
      val pairs = Dedup.streamingMinHashPairs(feed, "ts", "30 days",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5,
        portableHashes = true)
      val sink = s"dms_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      // Streaming queries clone the session at start, so these two are
      // captured by THIS query only and restored right after: 8 state
      // partitions (matching the feed), and no no-data micro-batches —
      // each processAllAvailable otherwise runs a second, empty trigger
      // purely to fire event-time timeouts, and this state machine's
      // timeout path only drops state, never emits (safe to skip; the
      // horizon-pruning semantics are spec-pinned separately).
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      val prevNoData = s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      val prevCksum = s.conf.getOption("spark.sql.streaming.checkpoint.fileChecksum.enabled")
      s.conf.set("spark.sql.shuffle.partitions", 8)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      // Spark 4.1 checksums every checkpoint file write by default
      // (ChecksumCheckpointFileManager: one checksum companion file +
      // thread per write). Durability verification is pure overhead for
      // this REPLAY's ephemeral per-run checkpoint — measured ~10% of
      // the entry, on top of a per-file fsync cost that tripled on a
      // slow-sync host (r8 bisect). A production deployment with a
      // durable checkpoint decides this conf for itself.
      s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      val sq =
        try pairs.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        finally {
          s.conf.set("spark.sql.shuffle.partitions", prevParts)
          s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
          prevCksum match {
            case Some(v) => s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", v)
            case None => s.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
          }
        }
      try {
        val base = 1700000000000L
        val rows = docs(s, dir).select(col("doc_id").cast("long"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        rows.grouped(math.max(1, rows.length / 5 + 1)).foreach { g =>
          mem.addData(g.toSeq.map { case (id, tx) => (base + id, id, tx) })
          sq.processAllAvailable()
        }
      } finally sq.stop()
      s.table(sink).select("id_a", "id_b", "est_jaccard")
        .dropDuplicates("id_a", "id_b")
    }),

    // md5-derived 60-bit token hash so DuckDB reproduces the signatures
    // bit-for-bit; the oracle brute-forces all pairs, so it also proves
    // the segment blocking is recall-complete at this radius
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHashPairs(docs(s, dir), maxHamming = 6,
        hashFn = Dedup.md5Hash60)),

    // pairwise evidence → dedup groups: connected components over the
    // (oracle-checked) jaccard pairs, min-id survivor, cluster sizes
    "dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.nearDupClusters(d, Dedup.ngramJaccardPairs(d, k = 3, threshold = 0.5))
    }),

    "dedup_embedding" -> ((s, dir) =>
      // 0.35 sits inside the synthetic corpus's similarity range (max
      // within-label cosine ≈ 0.45-0.47), so the oracle checks real pairs
      Dedup.embeddingNearDupPairs(emb(s, dir), threshold = 0.35, blockCol = "label")),

    // SemDedup-style semantic dedup end-to-end: blocked cosine pairs →
    // min-label clusters → one min-id representative per semantic group
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticRepresentatives(emb(s, dir), threshold = 0.35,
        blockCol = "label")),

    // the published SemDedup recipe with NO label crutch: portable
    // k-means cells as the blocking structure, within-cell cosine pairs.
    // The oracle replays TRAINING (2 integer Lloyd rounds), the final
    // integer-L2 assignment, and the pair join — the whole pipeline is
    // the hash-checked artifact
    "dedup_semdedup_kmeans" -> ((s, dir) =>
      Dedup.semDedupPairs(emb(s, dir), threshold = 0.35,
        nClusters = 8, iters = 2)),

    // the SCALE configuration of the same pipeline (VERDICT r7 item 1):
    // k = ceil(n / 100) instead of a constant, holding cell occupancy
    // fixed as the corpus grows — the form whose candidate volume stays
    // corpus-linear (Sf100Probe pins the exponents). The oracle computes
    // the same k with a scalar subquery; the training CTEs are
    // k-independent (k only enters the seed hash's modulus)
    "dedup_semdedup_scaled" -> ((s, dir) =>
      Dedup.semDedupAutoK(emb(s, dir), threshold = 0.35,
        targetOccupancy = 100, iters = 2)),

    // the fully-linear scale path: same occupancy-fixed cell count, but
    // the quantizer is a hyperplane sign pattern (b = ceil(log2(cells))
    // md5-derived planes) instead of exact Lloyd — flat k-means training
    // is O(n·d·k), quadratic once k ∝ n, which is the measured reason
    // the kmeans leg's probe stops at 10× (see Sf100Probe). Signature +
    // pair cost are both corpus-linear up to the log factor.
    "dedup_semdedup_lsh" -> ((s, dir) =>
      Dedup.semDedupLshPairs(emb(s, dir), threshold = 0.35,
        targetOccupancy = 100)),

    "similarity_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
    }),

    // int8-quantized ANN (r6): cosine over quantized vectors is exact
    // integer arithmetic (the per-vector scales cancel), so the ranking
    // is bit-reproducible in DuckDB — 4x less candidate volume at scale
    "similarity_int8_topk" -> ((s, dir) => {
      // single-file embeddings parquet = one split; the per-row integer
      // dot products against every broadcast query are the heavy stage
      val e = emb(s, dir).repartition(s.sparkContext.defaultParallelism)
      Similarity.int8TopK(e, e.filter(col("vec_id") < 10), k = 5)
    }),

    // The float-trained IVF leg (`Similarity.ivfTopK`) is NOT a driver
    // entry anymore (VERDICT r9 item 3, retirement option): float Lloyd
    // centroids are order-of-summation dependent, so no DuckDB oracle can
    // replay them, and its top-k set genuinely differs from both the
    // exact and the portable twin (measured 90-92% recall@5 on the
    // testdata, tools.AgreementProbe) — a rows-only driver row checked
    // nothing the specs don't. Coverage now: PipelineSpec "ivf recall@5
    // vs brute force is reasonable" pins the float path's recall floor;
    // `similarity_ivf_portable` (below) hash-checks the identical plan
    // shape end-to-end; `similarity_ivfpq_topk` benches the composed
    // scale recipe.

    // random-hyperplane LSH ANN: deterministic md5-derived planes, so the
    // whole pipeline (signatures, band buckets, candidates, ranking) is
    // reproduced by the DuckDB oracle — not just a rows-only check
    "similarity_lsh_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10), k = 5,
        nPlanes = 16, bands = 4)
    }),

    // full probe (nProbe = nClusters) must recover the exact top-k — this
    // oracle-checks the whole IVF machinery (centroid training, list
    // assignment, probe join, ranking) against the brute-force SQL
    "similarity_ivf_exact" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), k = 5,
        nClusters = 16, nProbe = 16)
    }),

    // the PARTIAL-probe IVF result itself, hash-checked: kmeansMicro
    // training + integer-L2 assignment/probing are cross-engine exact,
    // so the oracle replays the whole pipeline (the float-trained
    // similarity_ivf_topk above stays rows-only — this is its portable
    // twin, the same move dedup_minhash_lsh_portable makes for LSH)
    "similarity_ivf_portable" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopKPortable(e, e.filter(col("vec_id") < 10), k = 5,
        nClusters = 16, nProbe = 4)
    }),

    // IVF-PQ composed (coarse cells + product-quantized residuals + ADC
    // over probed cells only — the billion-scale recipe): coarse
    // training, residual codebooks, encoding, probing and ranking are
    // all exact integer micro-unit arithmetic, so the oracle replays
    // the ENTIRE pipeline CTE-for-CTE
    "similarity_ivfpq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), k = 5,
        nCells = 8, nProbe = 3)
    }),

    // end-to-end corpus selection, the composition a training-data run
    // actually executes: language gate ∧ quality floor ∧ exact-dedup
    // survivorship, in one narrow pass over the documents
    "pipeline_corpus_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      val survivors = Dedup.exactDedup(d).select(col("doc_id"))
      d.join(survivors, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang_pred"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
    }),

    // hot-key aggregation through the salt-and-remerge path: must be
    // value-identical to a direct group-by (here checked against DuckDB)
    "skew_salted_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      graft.pipeline.Skew.saltedAgg(li, Seq("l_returnflag"),
          col("l_orderkey"), buckets = 16,
          partial = sum("l_quantity"), merge = sum, as = "sum_qty")
        .select(col("l_returnflag"), round(col("sum_qty"), 4).as("sum_qty"))
    }),

    "text_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    "text_subword_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))),

    // Gopher/MassiveText repetition filter: duplicate 2-gram and 3-gram
    // fractions per document (degenerate repetition / boilerplate signal)
    "text_repetition" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        round(TextAnalysis.dupNgramRatio(col("text"), 2), 6).as("dup2"),
        round(TextAnalysis.dupNgramRatio(col("text"), 3), 6).as("dup3"))),

    // deterministic hash sampling + train/val/test split assignment —
    // reproducible corpus carving with NO shuffle and NO random(): a 20%
    // keyed sample, each kept document assigned its stable split
    "pipeline_sample_split" -> ((s, dir) =>
      Sampling.splitAssign(
          Sampling.deterministicSample(docs(s, dir), "doc_id", percent = 20),
          "doc_id")
        .select("doc_id", "split")),

    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    // char-trigram profile variant (Cavnar-Trenkle shape, r6): sliding
    // 3-char windows, profile-hit counts, fixed priority tiebreak
    "text_langid_ngram" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.langIdNgram(col("text")).as("lang_pred"))),

    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),

    // winnowing (MOSS rolling-hash) fingerprint set, exploded to
    // (doc_id, fp) rows for the hash compare
    "text_winnow_fp" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        explode(TextAnalysis.winnowingFingerprints(col("text"))).as("fp"))),

    // benchmark-contamination sweep: benchmark set = every 50th document,
    // 3-gram overlap (n=3 keeps the synthetic corpus non-vacuous; corpus
    // scale uses 13), hot grams capped at df<=20
    "text_contamination" -> ((s, dir) => {
      // the driver parquet is one small file → one input split; without a
      // repartition the gram HOF runs on a single core (Triplizer does the
      // same for the quad projection — on a real cluster the reader splits
      // by row group and this shuffle of raw rows is cheap)
      val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
      Contamination.contaminatedPairs(
        d, d.filter(col("doc_id") % 50 === 0),
        n = 3, minShared = 2, maxDf = Some(20), checkpointGrams = true)
    }),

    // domain-mixing weighted sampler: per-source keep rates (including a
    // zero weight), deterministic by doc_id hash — corpus mixture recipes
    "pipeline_weighted_mix" -> ((s, dir) =>
      Sampling.weightedSample(docs(s, dir), "doc_id", "source",
          Map("src0" -> 10, "src1" -> 50, "src2" -> 0), defaultPercent = 80)
        .select("doc_id", "source")),

    // token-budget sharding: two-pass distributed prefix sum (per-partition
    // running sums + one #partitions-row offset window) — shard boundaries
    // identical to DuckDB's global window
    "pipeline_token_shards" -> ((s, dir) =>
      Sampling.tokenShards(docs(s, dir), budget = 1000L)),

    // context-window packing: 50-token chunks, 10-token overlap
    "pipeline_chunk_overlap" -> ((s, dir) =>
      TextAnalysis.chunk(docs(s, dir), chunkTokens = 50, overlap = 10)),

    // multinomial temperature mixing at alpha=0.7: smallest source keeps
    // 100%, larger sources downsampled by (n_src/n_min)^(alpha-1). The
    // testdata's sources are uniform-25 each, which would make the mix a
    // no-op — a 70/20/10 corpus-tier derivation (web/books/wiki) gives
    // the operator real skew to rebalance.
    "pipeline_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(
          docs(s, dir).withColumn("corpus",
            when(col("doc_id") % 10 < 7, lit("web"))
              .when(col("doc_id") % 10 < 9, lit("books"))
              .otherwise(lit("wiki"))),
          "doc_id", "corpus", alpha = 0.7)
        .select("doc_id", "corpus")),

    // tokenizer-pipeline pair: corpus vocabulary (top-K tokens, ranked
    // deterministically) and per-document OOV occurrence rate against it
    "text_vocab_topk" -> ((s, dir) =>
      TextAnalysis.vocabulary(docs(s, dir), k = 20)),

    "text_oov_rate" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.oovRate(d, TextAnalysis.vocabulary(d, k = 10))
    }),

    // PII detect + redact over deterministically seeded text (the corpus
    // itself carries no PII; the seed makes every row non-vacuous and is
    // reproduced verbatim by the oracle)
    "text_pii_scrub" -> ((s, dir) => {
      val seeded = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact doc"), col("doc_id").cast("string"), lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" at 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")).as("seeded"))
      val countCols = TextAnalysis.piiCounts(col("seeded")).map { case (n, c) => c.as(n) }
      seeded.select(col("doc_id") +: countCols :+
        TextAnalysis.piiScrub(col("seeded")).as("scrubbed"): _*)
    }),

    // CCNet-style perplexity proxy: unigram LM trained on half the corpus
    // (even doc_ids), every document scored — unseen-token smoothing is
    // exercised by the held-out odd half
    "lm_nll_unigram" -> ((s, dir) => {
      val d = docs(s, dir)
      val lm = graft.pipeline.LanguageModel.train(d.filter(col("doc_id") % 2 === 0), n = 1)
      graft.pipeline.LanguageModel.scoreNll(d, lm, n = 1)
        .select(col("doc_id"), round(col("nll"), 6).as("nll"))
    }),

    "lm_nll_bigram" -> ((s, dir) => {
      val d = docs(s, dir)
      val lm = graft.pipeline.LanguageModel.train(d.filter(col("doc_id") % 2 === 0), n = 2)
      graft.pipeline.LanguageModel.scoreNll(d, lm, n = 2)
        .select(col("doc_id"), round(col("nll"), 6).as("nll"))
    }),

    // trigram stupid-backoff LM (trained on even docs, scored on all, so
    // every backoff level INCLUDING OOV fires on the odd docs): per-doc
    // Σ floor(−ln(s)·10⁶) integer micro-units — order-independent, so
    // training counts AND the four-level backoff scoring hash-check
    "lm_nll_trigram" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.pipeline.LanguageModel.trigramBackoffNll(
        d, d.filter(col("doc_id") % 2 === 0))
    }),

    // Lee et al.-style passage dedup: token 8-grams repeated across >= 2
    // documents are scrubbed from every document (47 docs change at
    // sf0.01); the cleaned text is hash-checked end-to-end
    "dedup_passage_scrub" -> ((s, dir) =>
      graft.pipeline.PassageDedup.scrubbed(
        docs(s, dir).repartition(s.sparkContext.defaultParallelism),
        k = 8, minDocs = 2)),

    // Gopher/MassiveText quality rules over deterministically seeded text
    // (bullet/ellipsis/symbol lines appended by doc_id so rules (c)-(e)
    // are non-vacuous on the single-line word-soup corpus); outputs every
    // rule's measured value plus the pass verdict
    "text_gopher_quality" -> ((s, dir) => {
      val lines = concat(
        array(col("text")),
        when(col("doc_id") % 4 === 0,
          array(lit("- bullet item one"), lit("* bullet item two"),
            lit("- bullet item three")))
          .otherwise(array().cast("array<string>")),
        when(col("doc_id") % 3 === 0, array(lit("A trailing thought goes on...")))
          .otherwise(array().cast("array<string>")))
      val seeded = docs(s, dir).select(col("doc_id"),
        concat(array_join(lines, "\n"),
          when(col("doc_id") % 5 === 0, lit("\n# ## ### more... stuff..."))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.gopherQuality(seeded)
        .withColumn("gopher_pass", col("gopher_pass").cast("int"))
    }),

    // concat-and-chunk sequence packing at seqLen=128: documents laid
    // end-to-end in doc_id order via the two-pass distributed prefix sum,
    // split at sequence boundaries — one row per (sequence, doc) span
    // with the span text hash-checked end-to-end
    "pipeline_pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(docs(s, dir), seqLen = 128)),

    // DSIR-style data selection: hashed-bigram importance weights of the
    // whole corpus against the lang='en' target slice — 1000 buckets,
    // add-one smoothing, md5-portable bucket hash (hash-checked)
    "pipeline_dsir_logw" -> ((s, dir) => {
      // one small parquet file → one input split; spread the tokenize+md5
      // work across cores (same note as text_contamination)
      val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
      graft.pipeline.Dsir.logImportanceWeights(
        d, d.filter(col("lang") === "en"), n = 2, buckets = 1000)
    }),

    // C4-style line + document cleaning over deterministically seeded
    // multi-line text (the synthetic corpus is single-line word soup, so
    // the seed constructs documents that exercise every rule: short
    // lines, unterminated lines, javascript lines, variable good-line
    // counts, lorem-ipsum docs, curly-brace docs)
    "text_c4_clean" -> ((s, dir) => {
      val good = transform(
        sequence(lit(1), lit(2) + (col("doc_id") % 3).cast("int")),
        i => concat(lit("Good sentence number "), i.cast("string"),
          lit(" for document "), col("doc_id").cast("string"), lit(".")))
      val lines = concat(
        array(lit("tiny line."),
          lit("This sentence has no terminal punctuation at all"),
          lit("Some javascript code sentence should be removed okay.")),
        good,
        when(col("doc_id") % 5 === 0,
          array(lit("And lorem ipsum dolor sit amet appears here.")))
          .otherwise(array().cast("array<string>")),
        when(col("doc_id") % 7 === 0,
          array(lit("A line with { brace in it appears now.")))
          .otherwise(array().cast("array<string>")))
      val seeded = docs(s, dir)
        .select(col("doc_id"), array_join(lines, "\n").as("text"))
      TextAnalysis.c4Clean(seeded)
    }),

    // per-document top-3 TF-IDF keywords (smoothed idf; rounded-score
    // ranking so the winner is engine-portable)
    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(docs(s, dir), k = 3)),

    // exact nearest-rank percentiles of per-document token counts —
    // histogram aggregation, NOT a global sort or approx_percentile
    "pipeline_percentiles" -> ((s, dir) =>
      graft.pipeline.CorpusStats.exactPercentiles(
        docs(s, dir).select(
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks")),
        "n_toks", Seq(0.5, 0.9, 0.99))),

    // BPE tokenizer: 200 merges trained from the distributed word
    // histogram (corpus touched once; merge loop over the bounded
    // histogram), then distributed encode under the closure-shipped
    // merge ranks. Oracled end-to-end since r8 (VERDICT r7 item 5):
    // the DuckDB oracle replays BOTH loops as recursive CTEs — training
    // one iteration per merge round (argmax pair via a scalar subquery
    // over the working table, all-occurrence apply via run-parity as a
    // pure list expression) and encode one iteration per applied merge
    // (rank-greedy first-position, rank map lookup per adjacent pair).
    "pipeline_bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = graft.pipeline.Bpe.train(d, numMerges = 200)
      graft.pipeline.Bpe.encode(d, merges)
        .select(col("doc_id"), col("n_bpe_tokens"),
          array_join(slice(col("bpe_tokens"), 1, 8), " ").as("head_tokens"))
    }),

    // multimodal ingestion manifest hash-checked: documents wrapped as
    // binary payloads with typed metadata (Multimodal.mediaSchema), the
    // manifest = per-asset byte count + content digest — the catalog row
    // a 100 TB media lake keeps per object; decode/resize stay spec-side
    // (PipelineSpec), the PLUMBING is oracle-checked here
    "multimodal_manifest" -> ((s, dir) =>
      graft.pipeline.Multimodal.fromText(docs(s, dir), "doc_id", "text")
        .select(col("media_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"),
          md5(col("payload")).as("payload_md5"))),

    // multimodal NEAR-DUP pairs hash-checked: dHash (9×8 gradient
    // fingerprint) + the pigeonhole hamming blocking SimHash uses. Each
    // document payload is paired with a first-byte-perturbed twin, so
    // true near-dups exist by construction; text payloads drive the
    // SQL-reproducible byte-grid fallback (the IMAGE decode path's
    // parity with this same pairing is spec-pinned on real PNGs — no
    // SQL engine decodes PNGs). The oracle is the UNFILTERED all-pairs
    // hamming ground truth, so the blocking join's recall-completeness
    // is itself the checked property (the dedup_prefix_jaccard
    // discipline).
    "multimodal_phash_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.select((col("doc_id") * 2).as("media_id"), col("text"))
        .unionByName(d.select((col("doc_id") * 2 + 1).as("media_id"),
          concat(lit("X"), substring(col("text"), 2, Int.MaxValue)).as("text")))
      graft.pipeline.Multimodal.dHashPairs(
        graft.pipeline.Multimodal.fromText(corpus, "media_id", "text"),
        maxHamming = 3)
    }),

    // BPE merge TRAINING hash-checked: the first 3 learned merges over
    // the top-200 word histogram. The oracle unrolls each round in SQL —
    // lead()-paired symbol counts, (count desc, pair asc) argmax, and
    // greedy left-to-right merge application via run-parity selection
    // (consecutive overlapping matches — only possible when lhs = rhs —
    // group into runs; odd positions within a run merge, evens are
    // consumed). Training itself, not just the encode, is the checked
    // artifact.
    "pipeline_bpe_train" -> ((s, dir) => {
      import s.implicits._
      graft.pipeline.Bpe.train(docs(s, dir), numMerges = 3, maxWords = 200)
        .zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "lhs", "rhs")
    }),

    // Johnson–Lindenstrauss ±1 projection 64→16 over the embeddings
    // table: hash-seeded sign matrix inlined as plan literals, per-row
    // HOF arithmetic — exchange-free (plan-pinned in the spec). Long
    // format (vec_id, j, p) so the oracle regenerates the same signs.
    "similarity_jl_project" -> ((s, dir) =>
      graft.pipeline.RandomProjection.jlProject(emb(s, dir), dIn = 64, dOut = 16)
        .select(col("vec_id"), col("j").cast("long").as("j"), col("p"))),

    // product-quantization ANN on top of the exact k-means: per-subspace
    // codebooks (4×16 dims, 16 codes), integer ADC distance tables —
    // training, encoding, and ranking all hash-check
    "similarity_pq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.pqTopK(e, e.filter(col("vec_id") < 10), k = 10)
    }),

    // z-order (Morton) layout key over lineitem's two scan dimensions:
    // statically-unrolled bit interleave, per-row codegen arithmetic —
    // the clustering key behind zorderBy's range-partitioned write
    // (pruning behavior itself is pinned by LayoutSpec; this entry
    // hash-checks the curve mapping)
    "pipeline_zorder" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet").select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("rowid"),
        graft.pipeline.Layout.zValue(col("l_partkey"), col("l_suppkey"))
          .as("z"))),

    // distributed Lloyd's k-means whose TRAINING hash-checks: integer
    // micro-unit quantization + floor-division centroid means keep every
    // round exact, so the oracle unrolls both rounds as CTEs and the
    // final centroids (not just a downstream ranking) must match
    "similarity_kmeans" -> ((s, dir) =>
      Similarity.kmeansMicro(emb(s, dir), nClusters = 8, iters = 2)
        .select(col("cid"), col("pos").cast("long").as("pos"),
          col("cq"), col("n"))),

    // KMV distinct-count sketch (custom TypedImperativeAggregate) per
    // source: exact path on tokens (~31 distinct < k) AND estimator path
    // on token×doc pairs (~600 distinct > k), beside the exact counts.
    // md5-60 hashing makes the k-th smallest hash — hence the estimate —
    // bit-reproducible in DuckDB.
    "sketch_kmv_distinct" -> ((s, dir) => {
      graft.functions.KmvDistinct.register(s)
      val tok = docs(s, dir).select(col("source"), col("doc_id"),
        explode(TextAnalysis.tokens(trim(lower(col("text"))))).as("tok"))
      val pair = concat_ws("|", col("tok"), col("doc_id"))
      tok.groupBy("source").agg(
        countDistinct(col("tok")).as("n_tok_exact"),
        round(graft.functions.KmvDistinct(Dedup.md5Hash60(col("tok")), 128), 4)
          .as("kmv_tok"),
        countDistinct(pair).as("n_tokdoc_exact"),
        round(graft.functions.KmvDistinct(Dedup.md5Hash60(pair), 128), 4)
          .as("kmv_tokdoc"))
    }),

    // fastText-shaped quality classifier TRAINED here: 2 full-batch GD
    // steps over md5-60-hashed 1+2-gram features (dim 64), label =
    // "contains token 'spark'". The oracle unrolls the identical two
    // steps as SQL CTEs — training, not just scoring, is hash-checked.
    "pipeline_quality_classifier" -> ((s, dir) => {
      val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
      graft.pipeline.QualityClassifier.trainAndScore(
        d, array_contains(split(trim(lower(col("text"))), "\\s+"), "spark"),
        dim = 64, iters = 2, lr = 5.0)
    }),

    // excerpt/quote detection: the first-30-token snippet of every 50th
    // document probed against the full corpus at 90% shingle
    // containment — each snippet must at least rediscover its source
    // (Jaccard misses subset pairs when the source is much longer)
    "dedup_containment" -> ((s, dir) => {
      val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
      val snippets = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("probe_id"),
          array_join(slice(TextAnalysis.tokens(trim(col("text"))), 1, 30), " ")
            .as("text"))
      Dedup.containmentPairs(snippets, d, k = 3, threshold = 0.9)
    }),

    // snapshot diff between two derived corpus versions: "old" lacks
    // every 7th doc, "new" rewrites every 11th — statuses added /
    // removed / changed / unchanged must all be non-vacuous
    "pipeline_corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val oldC = d.filter(col("doc_id") % 7 =!= 0)
      val newC = d.withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      Dedup.corpusDiff(oldC, newC)
    }),

    // count-min sketch over the token stream (d=4, w=512): the full
    // counter table is an integer aggregation over md5 buckets, so the
    // sketch AND the min-over-depths estimates for the top-20 vocabulary
    // tokens are bit-identical in DuckDB — estimates sit beside exact
    // counts, so the overestimate behavior itself is hash-checked
    "sketch_cms_tokens" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text", lower(col("text")))
      val tok = d.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val cms = graft.pipeline.Sketches.countMin(tok, "token", d = 4, w = 512)
      val top = TextAnalysis.vocabulary(d, k = 20)
      graft.pipeline.Sketches.countMinEstimate(cms, top, "token", d = 4, w = 512)
        .join(top, Seq("token"))
        .select("token", "cnt", "cms_est", "rank")
    }),

    // HyperLogLog distinct-count sketch (custom TypedImperativeAggregate,
    // m=512 one-byte registers) per source: linear-counting regime on
    // distinct tokens (~tens ≪ 2.5m) AND raw-estimator regime on token
    // occurrences (thousands), beside the exact counts. The dyadic
    // register sum Σ2^(52−Mj) is an exact BIGINT, so the estimate is one
    // deterministic division — bit-reproducible in DuckDB from the same
    // md5-60 hashes.
    "sketch_hll_distinct" -> ((s, dir) => {
      graft.functions.HllDistinct.register(s)
      val tok = docs(s, dir).select(col("source"), col("doc_id"),
        posexplode(TextAnalysis.tokens(trim(lower(col("text"))))).as(Seq("pos", "tok")))
      val occ = concat_ws("#", col("tok"), col("doc_id"), col("pos"))
      tok.groupBy("source").agg(
        countDistinct(col("tok")).as("n_tok_exact"),
        round(graft.functions.HllDistinct(Dedup.md5Hash60(col("tok")), 9), 4)
          .as("hll_tok"),
        count(lit(1)).as("n_occ_exact"),
        round(graft.functions.HllDistinct(Dedup.md5Hash60(occ), 9), 4)
          .as("hll_occ"))
    }),

    // BM25 lexical retrieval: every 100th document's first 5 tokens form
    // a query; top-10 per query by integer micro-unit score (per-term
    // quantisation before the sum → float-order-independent totals)
    "text_bm25_topk" -> ((s, dir) => {
      // spread the occurrence explode past the single input split
      val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
      val q = d.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(trim(col("text"))), 1, 5), " ")
            .as("qtext"))
      graft.pipeline.Retrieval.bm25TopK(d, q, k = 10)
    }),

    // prefix-filtered exact Jaccard self-join (AllPairs): the oracle is
    // the UNFILTERED inverted-index ground truth, so a hash match also
    // proves the prefix filter loses no pair at the threshold
    "dedup_prefix_jaccard" -> ((s, dir) =>
      // one small parquet file = one input split: spread the shingle
      // explode across cores first (same note as text_contamination)
      Dedup.prefixJaccardPairs(
        docs(s, dir).repartition(s.sparkContext.defaultParallelism),
        k = 3, threshold = 0.6)),

    // PassJoin segment-blocked Levenshtein join: the oracle is the
    // brute-force all-pairs ground truth at the radius, so a hash match
    // also proves the segment blocking + position window lose no pair
    "dedup_editdistance" -> ((s, dir) =>
      Dedup.editDistancePairs(
        docs(s, dir).repartition(s.sparkContext.defaultParallelism),
        maxDist = 4)),

    // exact-quota stratified carve-out: 20 hash-smallest docs per source
    "pipeline_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), quota = 20,
          strataCol = "source", keyCol = "doc_id")
        .select("doc_id", "source", "pick")),

    // ranked domain cap: the 50 longest docs per source (two-phase
    // skew-safe rank; result provably equals the single global window)
    "pipeline_source_cap" -> ((s, dir) =>
      Sampling.topNPerGroup(docs(s, dir), n = 50, groupCol = "source",
          orderCols = Seq(col("n_chars").desc), keyCol = "doc_id")
        .select("doc_id", "source", "n_chars", "cap_rank")),

    // unicode canonicalization: the corpus is ASCII, so each row is
    // seeded with a deterministic non-NFC suffix — "cafe"+COMBINING
    // ACUTE (composes to the precomposed e-acute), ANGSTROM SIGN (an
    // NFC singleton), and a BEL the control strip must eat
    "text_unicode_clean" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.unicodeClean(concat(col("text"),
          lit(" cafe\u0301 \u212B\u0007x"), col("doc_id").cast("string")))
          .as("clean_text"))))

  // ---- DuckDB mirrors ----------------------------------------------------

  private val toks = """string_split_regex(trim(text), '\s+')"""
  private val stopAll = TextAnalysis.langProfiles.flatMap(_._2)
    .map(w => s"'$w'").mkString("[", ", ", "]")

  private def profScore(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> list_contains($lst, t)))"
  }

  /** The portable minhash family's (i, a_i, b_i) coefficient rows —
    * generated from the SAME md5 derivation the plan uses
    * ([[Dedup.mhCoeffs]]), inlined as a VALUES table. */
  private val mhCoeffValues: String =
    (0 until 32).map { i =>
      val (a, b) = Dedup.mhCoeffs(i)
      s"($i, ${a}, ${b})"
    }.mkString(", ")

  private val portableLshSql: String =
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
          shl AS (SELECT DISTINCT doc_id AS id,
                   list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
                 FROM t WHERE len(w) >= 3),
          e AS (SELECT DISTINCT id, unnest(shs) AS shingle FROM shl),
          base AS (SELECT id, shingle,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h0
                   FROM e),
          coeff(i, a, b) AS (VALUES $mhCoeffValues),
          mh AS (SELECT id, c.i AS i,
                   min((c.a * h0 + c.b) % 2147483647) AS h
                 FROM base, coeff c GROUP BY id, c.i),
          sig AS (SELECT id, list(h ORDER BY i) AS sig FROM mh GROUP BY id),
          band AS (SELECT id, sig, rb.range AS b,
                   ('0x' || substr(md5('band:' || CAST(rb.range AS VARCHAR) || ':' ||
                      array_to_string(list_transform(sig[rb.range*4+1 : rb.range*4+4],
                        x -> CAST(x AS VARCHAR)), ',')), 1, 15))::BIGINT AS bucket
                   FROM sig, range(8) rb),
          capped AS (SELECT * FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY b, bucket ORDER BY id) AS rn
                   FROM band) WHERE rn <= 4096),
          cand AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b,
                     a.sig AS sig_a, b2.sig AS sig_b
                   FROM capped a JOIN capped b2
                     ON a.b = b2.b AND a.bucket = b2.bucket AND a.id < b2.id)
          SELECT id_a, id_b,
                 round(CAST(len(list_filter(range(1, 33),
                   i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 32, 6) AS est_jaccard
          FROM cand
          WHERE CAST(len(list_filter(range(1, 33),
                   i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 32 >= 0.5"""

  /** Shared DuckDB mirrors of langId / qualityScore, reused by the
    * standalone text entries and the corpus-filter composition. */
  private val langIdSql: String = {
    val cases = TextAnalysis.langProfiles.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    val scores = TextAnalysis.langProfiles.map { case (l, ws) =>
      s"${profScore(ws)} AS s_$l"
    }.mkString(", ")
    val bestExpr = "greatest(" +
      TextAnalysis.langProfiles.map(p => s"s_${p._1}").mkString(", ") + ")"
    s"""WITH sc AS (SELECT doc_id, $scores FROM documents),
        b AS (SELECT *, $bestExpr AS best FROM sc)
        SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM b"""
  }

  /** DuckDB mirror of langIdNgram: overlapping trigrams via
    * list_transform(range, substr), profile-hit counts, same tiebreak. */
  private val langIdNgramSql: String = {
    val tris = """list_transform(
        range(1, greatest(len(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) - 2, 0) + 1),
        i -> substr(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), i, 3))"""
    val scores = TextAnalysis.trigramProfiles.map { case (l, ps) =>
      val set = ps.map(p => s"'$p'").mkString(", ")
      s"len(list_filter($tris, t -> t IN ($set))) AS s_$l"
    }.mkString(", ")
    val cases = TextAnalysis.trigramProfiles.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    val bestExpr = "greatest(" +
      TextAnalysis.trigramProfiles.map(p => s"s_${p._1}").mkString(", ") + ")"
    s"""WITH sc AS (SELECT doc_id, $scores FROM documents),
        b AS (SELECT *, $bestExpr AS best FROM sc)
        SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM b"""
  }

  private val qualitySql: String =
    s"""SELECT doc_id, ROUND((
          least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) +
          least(CAST(${profScore(TextAnalysis.langProfiles.flatMap(_._2))} AS DOUBLE)
                / greatest(CAST(len($toks) AS DOUBLE), 1.0) * 5.0, 1.0) +
          CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                / greatest(CAST(len(text) AS DOUBLE), 1.0)
        ) / 3.0, 6) AS quality FROM documents"""

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH f AS (SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents)
         SELECT MIN(doc_id) AS doc_id, fp, COUNT(*) AS group_size
         FROM f GROUP BY fp""",

    "dedup_incremental" ->
      """WITH f AS (SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM documents),
          nw AS (SELECT doc_id, fp FROM f WHERE doc_id % 3 = 0),
          corp AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 <> 0)
         SELECT n.doc_id, n.fp FROM nw n
         WHERE NOT EXISTS (SELECT 1 FROM corp c WHERE c.fp = n.fp)""",

    // the full portable-hash LSH pipeline in SQL: shingles → 32 md5-60
    // minhashes → 8 band buckets (md5-60 over the band's joined sig
    // slice) → 4096-cap → bucket-join candidates → matching-fraction
    // estimate; mirrors Dedup.minHashLshPairs(portableHashes = true).
    // The SAME SQL checks the streaming replay entry: with a horizon
    // beyond the feed span and an unhit cap, the state machine must
    // emit exactly the batch pair set.
    "dedup_minhash_lsh_portable" -> portableLshSql,

    // the xxhash64 default family, hash-checked against the PORTABLE
    // replay's pair set (families agree on this corpus — AgreementProbe)
    "dedup_minhash_lsh" -> s"SELECT id_a, id_b FROM ($portableLshSql)",
    "dedup_minhash_stream" -> portableLshSql,

    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
          sh AS (SELECT DISTINCT doc_id AS id,
                   list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
                 FROM t WHERE len(w) >= 3),
          e AS (SELECT DISTINCT id, unnest(shs) AS shingle FROM sh),
          sz AS (SELECT id, COUNT(*) AS n_sh FROM e GROUP BY id),
          cm AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
                 FROM e a JOIN e b ON a.shingle = b.shingle AND a.id < b.id
                 GROUP BY 1, 2)
          SELECT id_a, id_b,
                 ROUND(CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common), 6) AS jaccard
          FROM cm JOIN sz na ON na.id = id_a JOIN sz nb ON nb.id = id_b
          WHERE CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common) >= 0.5""",

    "dedup_clusters" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS w FROM documents),
          sh AS (SELECT DISTINCT doc_id AS id,
                   list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
                 FROM t WHERE len(w) >= 3),
          e AS (SELECT DISTINCT id, unnest(shs) AS shingle FROM sh),
          sz AS (SELECT id, COUNT(*) AS n_sh FROM e GROUP BY id),
          cm AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
                 FROM e a JOIN e b ON a.shingle = b.shingle AND a.id < b.id
                 GROUP BY 1, 2),
          p AS (SELECT id_a, id_b FROM cm
                JOIN sz na ON na.id = id_a JOIN sz nb ON nb.id = id_b
                WHERE CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common) >= 0.5),
          ed AS (SELECT id_a AS v, id_b AS u FROM p
                 UNION SELECT id_b, id_a FROM p),
          rr(v, u) AS (SELECT v, u FROM ed
                       UNION SELECT ed.v, rr.u FROM ed JOIN rr ON rr.v = ed.u),
          mr AS (SELECT v, MIN(u) AS m FROM rr WHERE u < v GROUP BY v),
          lab AS (SELECT d.doc_id, COALESCE(mr.m, d.doc_id) AS cluster_id
                  FROM documents d LEFT JOIN mr ON mr.v = d.doc_id)
          SELECT doc_id, cluster_id,
                 COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
          FROM lab""",

    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                  sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                       list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))), 6) AS cos
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                    list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) >= 0.35 - 5e-7""",

    "dedup_semantic" ->
      """WITH RECURSIVE p AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id
           WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                 sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                      list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))
                 >= 0.35 - 5e-7),
          ed AS (SELECT id_a AS v, id_b AS u FROM p
                 UNION SELECT id_b, id_a FROM p),
          rr(v, u) AS (SELECT v, u FROM ed
                       UNION SELECT ed.v, rr.u FROM ed JOIN rr ON rr.v = ed.u),
          mr AS (SELECT v, MIN(u) AS m FROM rr WHERE u < v GROUP BY v),
          lab AS (SELECT e.vec_id, COALESCE(mr.m, e.vec_id) AS cluster_id
                  FROM embeddings e LEFT JOIN mr ON mr.v = e.vec_id),
          sz AS (SELECT vec_id, cluster_id,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
                 FROM lab)
          SELECT vec_id, cluster_size FROM sz WHERE vec_id = cluster_id""",

    "dedup_simhash" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
                    FROM documents),
          h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM t),
          bt AS (SELECT doc_id, b,
                   SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                 FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bs
                 GROUP BY doc_id, b),
          sig AS (SELECT doc_id,
                    SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END) AS simhash
                  FROM bt GROUP BY doc_id)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""",

    "similarity_lsh_topk" ->
      """WITH planes AS (
            SELECT p.p, j.j,
                   ((('0x' || substr(md5('plane-' || p.p || '-' || j.j), 1, 15))::BIGINT
                     % 2049) - 1024) / 1024.0 AS c
            FROM (SELECT unnest(range(0, 16)) AS p) p,
                 (SELECT unnest(range(0, 64)) AS j) j),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          dots AS (SELECT e.vec_id, pl.p, SUM(pl.c * e.v[pl.j + 1]) AS d
                   FROM e, planes pl GROUP BY e.vec_id, pl.p),
          bits AS (SELECT vec_id, p,
                     CASE WHEN d > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS b
                   FROM dots),
          sig AS (SELECT vec_id, p // 4 AS band,
                    SUM(b << (p % 4)) AS bval
                  FROM bits GROUP BY vec_id, p // 4),
          cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
                   FROM sig q JOIN sig c
                     ON q.band = c.band AND q.bval = c.bval
                        AND q.vec_id <> c.vec_id
                   WHERE q.vec_id < 10),
          s AS (SELECT cand.qid, cand.nid,
                  ROUND(list_dot_product(a.v, b.v) /
                    sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)),
                    6) AS cos
                FROM cand JOIN e a ON a.vec_id = cand.qid
                          JOIN e b ON b.vec_id = cand.nid),
          r AS (SELECT qid, nid, cos,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
                FROM s)
          SELECT qid, nid, cos, rank FROM r WHERE rank <= 5""",

    "similarity_ivf_exact" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
          s AS (SELECT qid, nid,
                  ROUND(list_dot_product(qv, nv) /
                    sqrt(list_dot_product(qv, qv) * list_dot_product(nv, nv)), 6) AS cos
                FROM q JOIN c ON qid <> nid),
          r AS (SELECT qid, nid, cos,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
                FROM s)
          SELECT qid, nid, cos, rank FROM r WHERE rank <= 5""",

    // the similarity_kmeans Lloyd CTEs at k=16, then IVF on top: codes =
    // argmin-centroid per vector, probes = 4 nearest centroids per query
    // (integer micro-unit L2, ties to the lowest cid — exactly the Spark
    // side's min_by/row_number ordering), scored by the shared round-6
    // cosine within probed lists only
    "similarity_ivf_portable" ->
      """WITH x AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
                    FROM embeddings),
          sd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % 16 AS INT) AS cid,
                   min(vec_id) AS id
                 FROM embeddings GROUP BY 1),
          c0 AS (SELECT cid, pos, xq AS cq FROM sd JOIN x USING (id)),
          d1 AS (SELECT x.id, c0.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c0 USING (pos) GROUP BY 1, 2),
          a1 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d1)
                 WHERE rn = 1),
          s1 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a1 USING (id) GROUP BY 1, 2),
          c1 AS (SELECT c0.cid, c0.pos,
                   COALESCE((s1.s - (((s1.s % s1.n) + s1.n) % s1.n)) // s1.n, c0.cq) AS cq
                 FROM c0 LEFT JOIN s1 ON c0.cid = s1.cid AND c0.pos = s1.pos),
          d2i AS (SELECT x.id, c1.cid, sum((xq - cq) * (xq - cq)) AS d2
                  FROM x JOIN c1 USING (pos) GROUP BY 1, 2),
          a2 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d2i)
                 WHERE rn = 1),
          s2 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a2 USING (id) GROUP BY 1, 2),
          c2 AS (SELECT c1.cid, c1.pos,
                   COALESCE((s2.s - (((s2.s % s2.n) + s2.n) % s2.n)) // s2.n, c1.cq) AS cq
                 FROM c1 LEFT JOIN s2 ON c1.cid = s2.cid AND c1.pos = s2.pos),
          dd AS (SELECT x.id, c2.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c2 USING (pos) GROUP BY 1, 2),
          codes AS (SELECT id AS nid, cid FROM (SELECT id, cid,
                      row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM dd)
                    WHERE rn = 1),
          probes AS (SELECT id AS qid, cid FROM (SELECT id, cid,
                       row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
                     FROM dd WHERE id < 10)
                     WHERE rn <= 4),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          sc AS (SELECT p.qid, codes.nid,
                   ROUND(list_dot_product(a.v, b.v) /
                     sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) AS cos
                 FROM probes p JOIN codes USING (cid)
                   JOIN e a ON a.vec_id = p.qid
                   JOIN e b ON b.vec_id = codes.nid
                 WHERE p.qid <> codes.nid),
          r AS (SELECT qid, nid, cos,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
                FROM sc)
          SELECT qid, nid, cos, rank FROM r WHERE rank <= 5""",

    // IVF-PQ end-to-end: the similarity_kmeans coarse chain (k=8), final
    // cell assignment, per-vector RESIDUALS split into 4×16 subspaces,
    // the pq codebook chain re-run on residuals (seeds % 16, two Lloyd
    // rounds), m-code encoding, nProbe=3 cell probing, per-(query, cell)
    // ADC distance tables, and the code-lookup scoring join
    "similarity_ivfpq_topk" ->
      """WITH x AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
                    FROM embeddings),
          sd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % 8 AS INT) AS cid,
                   min(vec_id) AS id
                 FROM embeddings GROUP BY 1),
          c0 AS (SELECT cid, pos, xq AS cq FROM sd JOIN x USING (id)),
          d1 AS (SELECT x.id, c0.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c0 USING (pos) GROUP BY 1, 2),
          a1 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d1)
                 WHERE rn = 1),
          s1 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a1 USING (id) GROUP BY 1, 2),
          c1 AS (SELECT c0.cid, c0.pos,
                   COALESCE((s1.s - (((s1.s % s1.n) + s1.n) % s1.n)) // s1.n, c0.cq) AS cq
                 FROM c0 LEFT JOIN s1 ON c0.cid = s1.cid AND c0.pos = s1.pos),
          d2i AS (SELECT x.id, c1.cid, sum((xq - cq) * (xq - cq)) AS d2
                  FROM x JOIN c1 USING (pos) GROUP BY 1, 2),
          a2 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d2i)
                 WHERE rn = 1),
          s2 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a2 USING (id) GROUP BY 1, 2),
          c2 AS (SELECT c1.cid, c1.pos,
                   COALESCE((s2.s - (((s2.s % s2.n) + s2.n) % s2.n)) // s2.n, c1.cq) AS cq
                 FROM c1 LEFT JOIN s2 ON c1.cid = s2.cid AND c1.pos = s2.pos),
          d3 AS (SELECT x.id, c2.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c2 USING (pos) GROUP BY 1, 2),
          a3 AS (SELECT id, cid AS cell FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d3)
                 WHERE rn = 1),
          xr AS (SELECT x.id, a3.cell, x.pos // 16 AS msub, x.pos % 16 AS spos,
                   x.xq - c2.cq AS rq
                 FROM x JOIN a3 USING (id)
                   JOIN c2 ON c2.cid = a3.cell AND c2.pos = x.pos),
          psd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % 16 AS INT) AS cid,
                    min(vec_id) AS id
                  FROM embeddings GROUP BY 1),
          pc0 AS (SELECT xr.msub, psd.cid, xr.spos, xr.rq AS cq
                  FROM psd JOIN xr ON psd.id = xr.id),
          pd1 AS (SELECT xr.id, xr.msub, pc0.cid, sum((rq - cq) * (rq - cq)) AS d2
                  FROM xr JOIN pc0 ON xr.msub = pc0.msub AND xr.spos = pc0.spos
                  GROUP BY 1, 2, 3),
          pa1 AS (SELECT id, msub, cid FROM (SELECT id, msub, cid,
                    row_number() OVER (PARTITION BY id, msub ORDER BY d2, cid) AS rn FROM pd1)
                  WHERE rn = 1),
          ps1 AS (SELECT pa1.msub, pa1.cid, xr.spos, CAST(sum(xr.rq) AS BIGINT) AS s, count(*) AS n
                  FROM xr JOIN pa1 ON xr.id = pa1.id AND xr.msub = pa1.msub
                  GROUP BY 1, 2, 3),
          pc1 AS (SELECT pc0.msub, pc0.cid, pc0.spos,
                    COALESCE((ps1.s - (((ps1.s % ps1.n) + ps1.n) % ps1.n)) // ps1.n, pc0.cq) AS cq
                  FROM pc0 LEFT JOIN ps1 ON pc0.msub = ps1.msub AND pc0.cid = ps1.cid AND pc0.spos = ps1.spos),
          pd2 AS (SELECT xr.id, xr.msub, pc1.cid, sum((rq - cq) * (rq - cq)) AS d2
                  FROM xr JOIN pc1 ON xr.msub = pc1.msub AND xr.spos = pc1.spos
                  GROUP BY 1, 2, 3),
          pa2 AS (SELECT id, msub, cid FROM (SELECT id, msub, cid,
                    row_number() OVER (PARTITION BY id, msub ORDER BY d2, cid) AS rn FROM pd2)
                  WHERE rn = 1),
          ps2 AS (SELECT pa2.msub, pa2.cid, xr.spos, CAST(sum(xr.rq) AS BIGINT) AS s, count(*) AS n
                  FROM xr JOIN pa2 ON xr.id = pa2.id AND xr.msub = pa2.msub
                  GROUP BY 1, 2, 3),
          pc2 AS (SELECT pc1.msub, pc1.cid, pc1.spos,
                    COALESCE((ps2.s - (((ps2.s % ps2.n) + ps2.n) % ps2.n)) // ps2.n, pc1.cq) AS cq
                  FROM pc1 LEFT JOIN ps2 ON pc1.msub = ps2.msub AND pc1.cid = ps2.cid AND pc1.spos = ps2.spos),
          cdd AS (SELECT xr.id, xr.cell, xr.msub, pc2.cid, sum((rq - cq) * (rq - cq)) AS d2
                  FROM xr JOIN pc2 ON xr.msub = pc2.msub AND xr.spos = pc2.spos
                  GROUP BY 1, 2, 3, 4),
          codes AS (SELECT id AS nid, cell, msub, cid AS code
                    FROM (SELECT id, cell, msub, cid,
                      row_number() OVER (PARTITION BY id, msub ORDER BY d2, cid) AS rn FROM cdd)
                    WHERE rn = 1),
          probes AS (SELECT id AS qid, cid AS cell FROM (SELECT id, cid,
                       row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
                     FROM d3 WHERE id < 10)
                     WHERE rn <= 3),
          qr AS (SELECT p.qid, p.cell, x.pos // 16 AS msub, x.pos % 16 AS spos,
                   x.xq - c2.cq AS rq
                 FROM probes p JOIN x ON x.id = p.qid
                   JOIN c2 ON c2.cid = p.cell AND c2.pos = x.pos),
          dt AS (SELECT qr.qid, qr.cell, qr.msub, pc2.cid, sum((rq - cq) * (rq - cq)) AS d2
                 FROM qr JOIN pc2 ON qr.msub = pc2.msub AND qr.spos = pc2.spos
                 GROUP BY 1, 2, 3, 4),
          sc AS (SELECT dt.qid, codes.nid, CAST(sum(dt.d2) AS BIGINT) AS dist
                 FROM codes JOIN dt ON codes.cell = dt.cell AND codes.msub = dt.msub
                   AND codes.code = dt.cid
                 WHERE dt.qid <> codes.nid GROUP BY 1, 2),
          r AS (SELECT qid, nid, dist,
                  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rank
                FROM sc)
          SELECT qid, nid, dist, CAST(rank AS INT) AS rank FROM r WHERE rank <= 5""",

    "similarity_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
          s AS (SELECT qid, nid,
                  ROUND(list_dot_product(qv, nv) /
                    sqrt(list_dot_product(qv, qv) * list_dot_product(nv, nv)), 6) AS cos
                FROM q JOIN c ON qid <> nid),
          r AS (SELECT qid, nid, cos,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
                FROM s)
          SELECT qid, nid, cos, rank FROM r WHERE rank <= 5""",

    // quantization mirrored exactly: scale = maxAbs/127 (1 when zero),
    // q = clamp(floor(v/scale + 0.5)); the cosine is integer dots only
    "similarity_int8_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
          qz AS (SELECT vec_id,
                   CASE WHEN list_max(list_transform(ev, x -> abs(x))) = 0
                        THEN 1.0
                        ELSE list_max(list_transform(ev, x -> abs(x))) / 127.0
                   END AS sc, ev
                 FROM v),
          qv AS (SELECT vec_id,
                   list_transform(ev, x -> greatest(-127, least(127,
                     CAST(floor(x / sc + 0.5) AS BIGINT)))) AS q
                 FROM qz),
          q AS (SELECT vec_id AS qid, q AS qq FROM qv WHERE vec_id < 10),
          c AS (SELECT vec_id AS nid, q AS nq FROM qv),
          s AS (SELECT qid, nid,
                  ROUND(list_dot_product(qq, nq) /
                    sqrt(list_dot_product(qq, qq) * list_dot_product(nq, nq)), 6) AS cos
                FROM q JOIN c ON qid <> nid),
          r AS (SELECT qid, nid, cos,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
                FROM s)
          SELECT qid, nid, cos, rank FROM r WHERE rank <= 5""",

    "skew_salted_agg" ->
      """SELECT l_returnflag, ROUND(SUM(l_quantity), 4) AS sum_qty
         FROM lineitem GROUP BY l_returnflag""",

    "text_token_count" ->
      s"""SELECT doc_id, len($toks) AS n_tokens FROM documents""",

    "text_subword_count" ->
      """SELECT doc_id,
                len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                  AS n_subwords
         FROM documents""",

    "pipeline_sample_split" ->
      """WITH b AS (SELECT doc_id,
                ('0x' || substr(md5('sample' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 100 AS sb,
                ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 100 AS pb
              FROM documents)
         SELECT doc_id,
                CASE WHEN pb < 80 THEN 'train'
                     WHEN pb < 90 THEN 'validation'
                     ELSE 'test' END AS split
         FROM b WHERE sb < 20""",

    "text_repetition" ->
      s"""WITH w AS (SELECT doc_id, $toks AS words FROM documents),
          g AS (SELECT doc_id,
                  CASE WHEN len(words) >= 2
                    THEN [array_to_string(words[i:i+1], ' ') FOR i IN range(1, len(words))]
                    ELSE [] END AS g2,
                  CASE WHEN len(words) >= 3
                    THEN [array_to_string(words[i:i+2], ' ') FOR i IN range(1, len(words)-1)]
                    ELSE [] END AS g3
                FROM w)
          SELECT doc_id,
            ROUND(CASE WHEN len(g2) = 0 THEN 0.0
              ELSE (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2) END, 6) AS dup2,
            ROUND(CASE WHEN len(g3) = 0 THEN 0.0
              ELSE (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3) END, 6) AS dup3
          FROM g""",

    "text_langid" -> langIdSql,

    "text_langid_ngram" -> langIdNgramSql,

    "text_quality" -> qualitySql,

    "pipeline_corpus_filter" ->
      s"""WITH lang AS ($langIdSql),
          q AS ($qualitySql),
          f AS (SELECT doc_id,
                  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                FROM documents),
          surv AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY fp)
          SELECT l.doc_id, l.lang_pred, q.quality
          FROM lang l
          JOIN q ON q.doc_id = l.doc_id
          JOIN surv ON surv.doc_id = l.doc_id
          WHERE l.lang_pred = 'en' AND q.quality >= 0.5""",

    "text_fingerprint" ->
      """SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents""",

    "text_winnow_fp" ->
      """WITH t AS (SELECT doc_id,
                      string_split_regex(lower(trim(text)), '\s+') AS toks
                    FROM documents),
          g AS (SELECT doc_id, i,
                  ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                                      toks[i+2]), 1, 15))::BIGINT AS h
                FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) r
                WHERE len(toks) >= 3),
          w AS (SELECT doc_id, h,
                  MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
                  COUNT(*) OVER (PARTITION BY doc_id) AS ng,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn
                FROM g)
          SELECT DISTINCT doc_id, m AS fp FROM w WHERE rn <= ng - 3
          UNION
          SELECT doc_id, MIN(h) AS fp FROM g GROUP BY doc_id
          HAVING COUNT(*) < 4""",

    "text_contamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                    FROM documents),
          g AS (SELECT doc_id, list_distinct(CASE WHEN len(words) >= 3
                  THEN [array_to_string(words[i:i+2], ' ') FOR i IN range(1, len(words) - 1)]
                  ELSE [] END) AS grams FROM w),
          e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
          f AS (SELECT gram, count(*) AS c FROM e GROUP BY gram),
          k AS (SELECT e.doc_id, e.gram FROM e JOIN f USING (gram) WHERE f.c <= 20),
          b AS (SELECT doc_id AS bench_id, gram FROM k WHERE doc_id % 50 = 0)
          SELECT k.doc_id AS doc_id, b.bench_id AS bench_id, count(*) AS shared
          FROM k JOIN b USING (gram)
          WHERE k.doc_id != b.bench_id
          GROUP BY 1, 2 HAVING count(*) >= 2""",

    "pipeline_weighted_mix" ->
      """WITH b AS (SELECT doc_id, source,
                ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 100 AS mb
              FROM documents)
         SELECT doc_id, source FROM b
         WHERE mb < CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 50
                                WHEN 'src2' THEN 0 ELSE 80 END""",

    // alpha=0.7: keep rate (n_src/n_min)^(alpha-1); 2^60 scales the
    // 60-bit md5 hash into [0,1) with the same double ops as the plan
    "pipeline_temperature_mix" ->
      """WITH d AS (SELECT doc_id,
                      CASE WHEN doc_id % 10 < 7 THEN 'web'
                           WHEN doc_id % 10 < 9 THEN 'books'
                           ELSE 'wiki' END AS corpus
                    FROM documents),
          n AS (SELECT corpus, CAST(count(*) AS DOUBLE) AS ns
                FROM d GROUP BY corpus),
          m AS (SELECT min(ns) AS mn FROM n),
          r AS (SELECT corpus, power(ns / mn, 0.7 - 1) AS rate FROM n, m)
         SELECT d.doc_id, d.corpus
         FROM d JOIN r ON d.corpus = r.corpus
         WHERE CAST(('0x' || substr(md5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                    AS DOUBLE) < rate * 1152921504606846976.0""",

    "pipeline_token_shards" ->
      """WITH t AS (SELECT doc_id,
                      len(string_split_regex(trim(text), '\s+')) AS n
                    FROM documents),
          c AS (SELECT doc_id, n,
                  COALESCE(SUM(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                FROM t)
          SELECT doc_id, n AS n_tokens,
                 CAST(FLOOR(cum / 1000.0) AS BIGINT) AS shard
          FROM c""",

    // chunkTokens=50, overlap=10 → stride 40; DuckDB 1-based inclusive
    // list slicing toks[s+1 : s+50] mirrors Spark's slice(toks, s+1, 50)
    "pipeline_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
          c AS (SELECT doc_id, tk,
                  GREATEST(1, CAST(CEIL((len(tk) - 10) / 40.0) AS BIGINT)) AS nc
                FROM t),
          x AS (SELECT doc_id, tk,
                  unnest(generate_series(0, nc - 1)) AS ix
                FROM c)
          SELECT doc_id, CAST(ix AS INT) AS chunk_ix,
                 array_to_string(tk[ix * 40 + 1 : ix * 40 + 50], ' ') AS chunk_text,
                 len(tk[ix * 40 + 1 : ix * 40 + 50]) AS chunk_tokens
          FROM x""",

    "text_vocab_topk" ->
      s"""WITH e AS (SELECT unnest($toks) AS token FROM documents),
          v AS (SELECT token, count(*) AS cnt,
                  row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rank
                FROM e GROUP BY token)
          SELECT token, cnt, rank FROM v WHERE rank <= 20""",

    "text_oov_rate" ->
      s"""WITH e AS (SELECT doc_id, unnest($toks) AS token FROM documents),
          v AS (SELECT token FROM (
                  SELECT token, row_number() OVER
                    (ORDER BY count(*) DESC, token ASC) AS rank
                  FROM e GROUP BY token) WHERE rank <= 10)
          SELECT doc_id,
            ROUND(AVG(CASE WHEN token IN (SELECT token FROM v)
                           THEN 0.0 ELSE 1.0 END), 6) AS oov
          FROM e GROUP BY doc_id""",

    "lm_nll_unigram" ->
      """WITH tw AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                     FROM documents WHERE doc_id % 2 = 0),
          trg AS (SELECT unnest(w) AS gram FROM tw),
          lm AS (SELECT gram, count(*) AS cnt FROM trg GROUP BY gram),
          tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n,
                         CAST(count(*) AS DOUBLE) AS v FROM lm),
          dg AS (SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS gram
                 FROM documents),
          sc AS (SELECT dg.doc_id,
                   AVG(ln(tot.n + tot.v) -
                       ln(CAST(COALESCE(lm.cnt, 0) AS DOUBLE) + 1.0)) AS nll
                 FROM dg CROSS JOIN tot LEFT JOIN lm USING (gram)
                 GROUP BY dg.doc_id)
          SELECT d.doc_id, ROUND(COALESCE(sc.nll, 0.0), 6) AS nll
          FROM documents d LEFT JOIN sc USING (doc_id)""",

    "lm_nll_bigram" ->
      """WITH tw AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                     FROM documents WHERE doc_id % 2 = 0),
          trg AS (SELECT unnest(CASE WHEN len(w) >= 2
                    THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                    ELSE [] END) AS gram FROM tw),
          lm AS (SELECT gram, count(*) AS cnt FROM trg GROUP BY gram),
          tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n,
                         CAST(count(*) AS DOUBLE) AS v FROM lm),
          dw AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
                 FROM documents),
          dg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
                   THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                   ELSE [] END) AS gram FROM dw),
          sc AS (SELECT dg.doc_id,
                   AVG(ln(tot.n + tot.v) -
                       ln(CAST(COALESCE(lm.cnt, 0) AS DOUBLE) + 1.0)) AS nll
                 FROM dg CROSS JOIN tot LEFT JOIN lm USING (gram)
                 GROUP BY dg.doc_id)
          SELECT d.doc_id, ROUND(COALESCE(sc.nll, 0.0), 6) AS nll
          FROM documents d LEFT JOIN sc USING (doc_id)""",

    // the backoff mirror: α and α² written as ::DOUBLE products (a bare
    // 0.16 literal would be exact DECIMAL, not the float product the
    // Scala side computes); every ratio is the identical IEEE op chain
    "lm_nll_trigram" ->
      """WITH tw AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                     FROM documents WHERE doc_id % 2 = 0),
          t3 AS (SELECT unnest(CASE WHEN len(w) >= 3
                   THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
                   ELSE [] END) AS gram FROM tw),
          c3 AS (SELECT gram, count(*) AS c3 FROM t3 GROUP BY gram),
          t2 AS (SELECT unnest(CASE WHEN len(w) >= 2
                   THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                   ELSE [] END) AS gram FROM tw),
          c2 AS (SELECT gram, count(*) AS c2 FROM t2 GROUP BY gram),
          t1 AS (SELECT unnest(w) AS gram FROM tw),
          c1 AS (SELECT gram, count(*) AS c1 FROM t1 GROUP BY gram),
          tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n,
                         CAST(count(*) AS DOUBLE) AS v FROM c1),
          dw AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
                 FROM documents),
          dg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
                   THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
                   ELSE [] END) AS gram FROM dw),
          dk AS (SELECT doc_id, gram,
                   p[1] || ' ' || p[2] AS pre, p[2] || ' ' || p[3] AS suf,
                   p[2] AS w2, p[3] AS w3
                 FROM (SELECT doc_id, gram, string_split(gram, ' ') AS p FROM dg)),
          sc AS (SELECT dk.doc_id, CAST(floor((CASE
                   WHEN g3.c3 IS NOT NULL
                     THEN -ln(CAST(g3.c3 AS DOUBLE) / CAST(p2.c2 AS DOUBLE))
                   WHEN s2.c2 IS NOT NULL
                     THEN -ln(0.4::DOUBLE * (CAST(s2.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)))
                   WHEN u3.c1 IS NOT NULL
                     THEN -ln((0.4::DOUBLE * 0.4::DOUBLE) * (CAST(u3.c1 AS DOUBLE) / tot.n))
                   ELSE -ln((0.4::DOUBLE * 0.4::DOUBLE) / (tot.n + tot.v)) END)
                   * 1000000.0) AS BIGINT) AS m
                 FROM dk CROSS JOIN tot
                   LEFT JOIN c3 g3 ON dk.gram = g3.gram
                   LEFT JOIN c2 p2 ON dk.pre = p2.gram
                   LEFT JOIN c2 s2 ON dk.suf = s2.gram
                   LEFT JOIN c1 u2 ON dk.w2 = u2.gram
                   LEFT JOIN c1 u3 ON dk.w3 = u3.gram),
          ag AS (SELECT doc_id, count(*) AS n_tri,
                   CAST(sum(m) AS BIGINT) AS nll_micro FROM sc GROUP BY doc_id)
          SELECT d.doc_id, COALESCE(ag.n_tri, 0) AS n_tri,
                 COALESCE(ag.nll_micro, 0) AS nll_micro
          FROM documents d LEFT JOIN ag USING (doc_id)""",

    "dedup_passage_scrub" ->
      """WITH lt AS (SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\s+') AS lw,
                       string_split_regex(trim(text), '\s+') AS w
                     FROM documents),
          g AS (SELECT doc_id, i, array_to_string(lw[i:i+7], ' ') AS gram
                FROM lt, LATERAL (SELECT unnest(range(1, len(lw) - 6)) AS i) r
                WHERE len(lw) >= 8),
          hot AS (SELECT gram FROM g GROUP BY gram
                  HAVING count(DISTINCT doc_id) >= 2),
          st AS (SELECT g.doc_id, list(DISTINCT g.i) AS ss
                 FROM g JOIN hot USING (gram) GROUP BY g.doc_id)
          SELECT lt.doc_id,
            COALESCE(array_to_string([lt.w[i] FOR i IN range(1, len(lt.w) + 1)
               IF len(list_filter(COALESCE(st.ss, CAST([] AS BIGINT[])),
                      s -> s <= i AND i < s + 8)) = 0], ' '), '') AS clean_text
          FROM lt LEFT JOIN st USING (doc_id)""",

    "text_c4_clean" ->
      """WITH s AS (SELECT doc_id,
              ['tiny line.',
               'This sentence has no terminal punctuation at all',
               'Some javascript code sentence should be removed okay.']
              || [ 'Good sentence number ' || CAST(i AS VARCHAR)
                     || ' for document ' || CAST(doc_id AS VARCHAR) || '.'
                   FOR i IN range(1, 3 + CAST(doc_id % 3 AS INT)) ]
              || CASE WHEN doc_id % 5 = 0
                   THEN ['And lorem ipsum dolor sit amet appears here.']
                   ELSE CAST([] AS VARCHAR[]) END
              || CASE WHEN doc_id % 7 = 0
                   THEN ['A line with { brace in it appears now.']
                   ELSE CAST([] AS VARCHAR[]) END AS lines
            FROM documents),
          k AS (SELECT doc_id,
              [ trim(l) FOR l IN lines
                IF regexp_matches(trim(l), '[.!?"'']$')
                   AND len(string_split_regex(trim(l), '\s+')) >= 5
                   AND NOT contains(lower(trim(l)), 'javascript') ] AS kept,
              array_to_string(lines, chr(10)) AS full_text
            FROM s)
          SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text
          FROM k
          WHERE len(kept) >= 3
            AND NOT contains(lower(full_text), 'lorem ipsum')
            AND NOT contains(full_text, '{')""",

    // hashed-bigram DSIR weights: same md5-60 bucket hash, add-one
    // smoothing, unseen-bucket default ratio; n=2, buckets=1000,
    // target = lang='en'
    "pipeline_dsir_logw" ->
      """WITH tw AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                     FROM documents WHERE lang = 'en'),
          tg AS (SELECT unnest(CASE WHEN len(w) >= 2
                   THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                   ELSE [] END) AS gram FROM tw),
          tb AS (SELECT ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1000 AS bucket,
                   count(*) AS ct FROM tg GROUP BY 1),
          rw AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                 FROM documents),
          rg AS (SELECT unnest(CASE WHEN len(w) >= 2
                   THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                   ELSE [] END) AS gram FROM rw),
          rb AS (SELECT ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1000 AS bucket,
                   count(*) AS cr FROM rg GROUP BY 1),
          tot AS (SELECT (SELECT CAST(COALESCE(sum(ct), 0) AS DOUBLE) FROM tb) AS nt,
                         (SELECT CAST(COALESCE(sum(cr), 0) AS DOUBLE) FROM rb) AS nr),
          ratio AS (SELECT COALESCE(tb.bucket, rb.bucket) AS bucket,
                      (ln(CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0) - ln(nt + 1000))
                    - (ln(CAST(COALESCE(cr, 0) AS DOUBLE) + 1.0) - ln(nr + 1000)) AS r
                    FROM tb FULL OUTER JOIN rb ON tb.bucket = rb.bucket, tot),
          dg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
                   THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                   ELSE [] END) AS gram
                 FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '\s+') AS w
                       FROM documents)),
          db AS (SELECT doc_id,
                   ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1000 AS bucket
                 FROM dg),
          sc AS (SELECT db.doc_id, count(*) AS n_grams,
                   ROUND(SUM(COALESCE(ratio.r,
                     ln(1.0 / (tot.nt + 1000)) - ln(1.0 / (tot.nr + 1000)))), 6) AS logw
                 FROM db LEFT JOIN ratio USING (bucket), tot
                 GROUP BY db.doc_id)
          SELECT d.doc_id, COALESCE(sc.n_grams, 0) AS n_grams,
                 COALESCE(sc.logw, 0.0) AS logw
          FROM documents d LEFT JOIN sc USING (doc_id)""",

    // DuckDB's md5(varchar) digests the UTF-8 bytes = Spark's
    // md5(text cast to binary); octet_length over the same encoding
    "multimodal_manifest" ->
      """SELECT doc_id AS media_id,
                'application/octet-stream' AS mime,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS payload_md5
         FROM documents""",

    // the byte-grid dHash unrolled: 9×8 sample grid (cell i reads byte
    // ⌊i·n/72⌋ — ord == byte on the ASCII corpus), gradient bit r·8+c
    // set iff cell(r,c+1) > cell(r,c) (bit 63 spelled as the sign-bit
    // constant: DuckDB refuses the overflowing 1<<63), then ALL-PAIRS
    // hamming ≤ 3 — the unfiltered ground truth the blocked join must
    // reproduce exactly
    "multimodal_phash_pairs" ->
      """WITH corpus AS (
           SELECT doc_id * 2 AS id, text FROM documents
           UNION ALL
           SELECT doc_id * 2 + 1 AS id, 'X' || substr(text, 2) AS text FROM documents),
         cells AS (
           SELECT id, i, ord(substr(text, i * length(text) // 72 + 1, 1)) AS v
           FROM corpus, range(0, 72) t(i)),
         bits AS (
           SELECT l.id, (l.i // 9) * 8 + (l.i % 9) AS j
           FROM cells l JOIN cells r ON r.id = l.id AND r.i = l.i + 1
           WHERE l.i % 9 <= 7 AND r.v > l.v),
         hashes AS (
           SELECT c.id,
                  COALESCE(bit_or(CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                                       ELSE CAST(1 AS BIGINT) << CAST(j AS INT) END), 0) AS dhash
           FROM corpus c LEFT JOIN bits b ON b.id = c.id
           GROUP BY c.id)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         FROM hashes a JOIN hashes b ON a.id < b.id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""",

    // the 3 training rounds unrolled: per round, lead()-adjacent pair
    // counts weighted by word count, (count desc, pair asc) argmax with
    // the >= 2 floor, then greedy merge application — match runs found
    // by i − row_number(), odd parity within a run merges, the i + 1
    // symbol each consumes is dropped, positions renumbered
    "pipeline_bpe_train" ->
      """WITH toks AS (SELECT unnest(string_split_regex(trim(lower(trim(text))), '\s+')) AS word
                       FROM documents),
          h AS (SELECT word, count(*) AS c FROM toks WHERE len(word) >= 1
                GROUP BY word
                QUALIFY row_number() OVER (ORDER BY count(*) DESC, word ASC) <= 200),
          s1p AS (SELECT word AS wid, c, unnest(range(1, len(word) + 1)) AS i FROM h),
          s1 AS (SELECT wid, c, i, substr(wid, CAST(i AS INT), 1) AS sym FROM s1p),
          pr1 AS (SELECT wid, c, i, sym,
                    lead(sym) OVER (PARTITION BY wid ORDER BY i) AS nxt
                  FROM s1),
          b1 AS (SELECT sym AS a, nxt AS b FROM pr1 WHERE nxt IS NOT NULL
                 GROUP BY sym, nxt HAVING sum(c) >= 2
                 ORDER BY sum(c) DESC, sym ASC, nxt ASC LIMIT 1),
          m1 AS (SELECT wid, i,
                   row_number() OVER (PARTITION BY wid, run ORDER BY i) % 2 AS par
                 FROM (SELECT pr1.wid, pr1.i,
                         pr1.i - row_number() OVER (PARTITION BY pr1.wid ORDER BY pr1.i) AS run
                       FROM pr1, b1 WHERE pr1.sym = b1.a AND pr1.nxt = b1.b)),
          sel1 AS (SELECT wid, i FROM m1 WHERE par = 1),
          s2 AS (SELECT wid, c, row_number() OVER (PARTITION BY wid ORDER BY i) AS i, sym
                 FROM (SELECT s.wid, s.c, s.i, b1.a || b1.b AS sym
                       FROM s1 s JOIN sel1 t ON s.wid = t.wid AND s.i = t.i, b1
                       UNION ALL
                       SELECT s.wid, s.c, s.i, s.sym FROM s1 s
                       WHERE NOT EXISTS (SELECT 1 FROM sel1 t
                             WHERE t.wid = s.wid AND (t.i = s.i OR t.i = s.i - 1)))),
          pr2 AS (SELECT wid, c, i, sym,
                    lead(sym) OVER (PARTITION BY wid ORDER BY i) AS nxt
                  FROM s2),
          b2 AS (SELECT sym AS a, nxt AS b FROM pr2 WHERE nxt IS NOT NULL
                 GROUP BY sym, nxt HAVING sum(c) >= 2
                 ORDER BY sum(c) DESC, sym ASC, nxt ASC LIMIT 1),
          m2 AS (SELECT wid, i,
                   row_number() OVER (PARTITION BY wid, run ORDER BY i) % 2 AS par
                 FROM (SELECT pr2.wid, pr2.i,
                         pr2.i - row_number() OVER (PARTITION BY pr2.wid ORDER BY pr2.i) AS run
                       FROM pr2, b2 WHERE pr2.sym = b2.a AND pr2.nxt = b2.b)),
          sel2 AS (SELECT wid, i FROM m2 WHERE par = 1),
          s3 AS (SELECT wid, c, row_number() OVER (PARTITION BY wid ORDER BY i) AS i, sym
                 FROM (SELECT s.wid, s.c, s.i, b2.a || b2.b AS sym
                       FROM s2 s JOIN sel2 t ON s.wid = t.wid AND s.i = t.i, b2
                       UNION ALL
                       SELECT s.wid, s.c, s.i, s.sym FROM s2 s
                       WHERE NOT EXISTS (SELECT 1 FROM sel2 t
                             WHERE t.wid = s.wid AND (t.i = s.i OR t.i = s.i - 1)))),
          pr3 AS (SELECT wid, c, i, sym,
                    lead(sym) OVER (PARTITION BY wid ORDER BY i) AS nxt
                  FROM s3),
          b3 AS (SELECT sym AS a, nxt AS b FROM pr3 WHERE nxt IS NOT NULL
                 GROUP BY sym, nxt HAVING sum(c) >= 2
                 ORDER BY sum(c) DESC, sym ASC, nxt ASC LIMIT 1)
          SELECT CAST(1 AS INT) AS rank, a AS lhs, b AS rhs FROM b1
          UNION ALL SELECT CAST(2 AS INT), a, b FROM b2
          UNION ALL SELECT CAST(3 AS INT), a, b FROM b3""",

    // the WHOLE tokenizer replayed (train 200 merges + rank-greedy
    // encode) as two recursive CTEs. Training: one iteration per merge
    // round — the round's argmax pair comes from a scalar subquery over
    // the working table (count desc, pair asc, stop below 2), and the
    // left-to-right all-occurrence apply is a pure list expression
    // (match positions grouped into consecutive runs by p - index;
    // within a run, alternate positions merge — the same run-parity
    // trick the 3-round unrolled train oracle uses relationally).
    // Encode: one iteration per applied merge — adjacent-pair ranks via
    // a map lookup, merge the FIRST occurrence of the LOWEST rank,
    // stop when no pair has a rank. Both loops are bounded (200 rounds;
    // word length), so recursion terminates structurally.
    "pipeline_bpe_encode" ->
      """WITH RECURSIVE
          h AS (SELECT word, count(*) AS c
                FROM (SELECT unnest(string_split_regex(trim(lower(trim(text))), '\s+')) AS word
                      FROM documents)
                WHERE len(word) >= 1 GROUP BY word
                QUALIFY row_number() OVER (ORDER BY count(*) DESC, word ASC) <= 100000),
          st(round, lhs, rhs, wid, c, syms) AS (
            SELECT 0, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), word, c,
                   [substr(word, i, 1) FOR i IN range(1, CAST(len(word) AS INT) + 1)]
            FROM h
            UNION ALL
            SELECT round + 1, best.a, best.b, wid, c,
                   CASE WHEN len(__mp) = 0 THEN syms ELSE
                     list_filter(list_transform(range(1, CAST(len(syms) AS INT) + 1),
                       i -> CASE WHEN list_contains(__ap, i) THEN syms[i] || syms[i+1]
                                 WHEN list_contains(__ap, i - 1) THEN NULL
                                 ELSE syms[i] END), x -> x IS NOT NULL)
                   END
            FROM (
              SELECT st.*,
                list_filter(range(1, CAST(len(syms) AS INT)),
                  i -> syms[i] = best.a AND syms[i+1] = best.b) AS __mp,
                list_transform(list_filter(range(1, CAST(len(syms) AS INT)),
                    i -> syms[i] = best.a AND syms[i+1] = best.b),
                  (x, j) -> {'p': x, 'rid': x - j}) AS __mr
              FROM (
                SELECT st.*,
                  (SELECT {'a': p[1], 'b': p[2], 'n': cnt} FROM (
                     SELECT p, sum(c) AS cnt FROM (
                       SELECT unnest(list_zip(s3.syms[1:CAST(len(s3.syms) AS INT)-1],
                                              s3.syms[2:])) AS p, s3.c
                       FROM st s3 WHERE len(s3.syms) > 1)
                     GROUP BY p ORDER BY cnt DESC, p[1] ASC, p[2] ASC LIMIT 1)) AS best
                FROM st) st)
              , LATERAL (SELECT list_transform(
                  list_filter(__mr, m -> (list_position(list_transform(__mr, q -> q.rid), m.rid)
                                          - list_position(list_transform(__mr, q -> q.p), m.p)) % 2 = 0),
                  m -> m.p) AS __ap) ap
            WHERE round < 200 AND best IS NOT NULL AND best.n >= 2),
          merges AS (SELECT round AS rank, any_value(lhs) AS lhs, any_value(rhs) AS rhs
                     FROM st WHERE round >= 1 GROUP BY round),
          mm AS (SELECT map_from_entries(list({'k': lhs || chr(1) || rhs, 'v': rank})) AS m
                 FROM merges WHERE lhs IS NOT NULL),
          dw AS (SELECT DISTINCT word FROM
                  (SELECT unnest(string_split_regex(trim(lower(trim(text))), '\s+')) AS word
                   FROM documents) WHERE len(word) >= 1),
          enc(step, word, syms, done) AS (
            SELECT 0, word,
                   [substr(word, i, 1) FOR i IN range(1, CAST(len(word) AS INT) + 1)],
                   false
            FROM dw
            UNION ALL
            SELECT step + 1, word,
                   CASE WHEN br < 2147483647
                        THEN syms[1:ba-1] || [syms[ba] || syms[ba+1]] || syms[ba+2:]
                        ELSE syms END,
                   br = 2147483647
            FROM (
              SELECT enc.*,
                list_min(rl) AS br,
                list_position(rl, list_min(rl)) AS ba
              FROM (SELECT enc.*,
                      list_transform(list_zip(syms[1:CAST(len(syms) AS INT)-1], syms[2:]),
                        p -> coalesce(list_extract(map_extract(mm.m,
                               p[1] || chr(1) || p[2]), 1), 2147483647)) AS rl
                    FROM enc, mm WHERE NOT done AND len(syms) > 1) enc)
            WHERE NOT done),
          encf AS (SELECT word, syms FROM (
                    SELECT word, syms, row_number() OVER (PARTITION BY word ORDER BY step DESC) AS rn
                    FROM enc) WHERE rn = 1),
          dwords AS (SELECT doc_id, i AS wi, w[i] AS word FROM (
                      SELECT doc_id, string_split_regex(trim(lower(trim(text))), '\s+') AS w
                      FROM documents), unnest(range(1, CAST(len(w) AS INT) + 1)) AS t(i)
                     WHERE len(w[i]) >= 1),
          dtoks AS (SELECT d.doc_id, flatten(list(e.syms ORDER BY d.wi)) AS toks
                    FROM dwords d JOIN encf e USING (word) GROUP BY d.doc_id)
          SELECT doc.doc_id,
                 coalesce(len(t.toks), 0) AS n_bpe_tokens,
                 coalesce(array_to_string(t.toks[1:8], ' '), '') AS head_tokens
          FROM (SELECT DISTINCT doc_id FROM documents) doc LEFT JOIN dtoks t USING (doc_id)""",

    // same md5-60-seeded sign matrix, same per-coordinate sums
    "similarity_jl_project" ->
      """WITH s AS (SELECT i.i, j.j,
                      CASE WHEN ('0x' || substr(md5('jl|' || i.i || '|' || j.j), 1, 15))::BIGINT
                             % 2 = 0
                           THEN 1.0 ELSE -1.0 END AS sgn
                    FROM range(64) i(i), range(16) j(j)),
          x AS (SELECT vec_id, i.i, CAST(embedding[i.i + 1] AS DOUBLE) AS v
                FROM embeddings, range(64) i(i))
          SELECT vec_id, j, ROUND(sum(v * sgn) / sqrt(16.0), 6) AS p
          FROM x JOIN s USING (i) GROUP BY vec_id, j""",

    // same statically-unrolled Morton interleave, as a list
    // comprehension over the 16 bit positions
    "pipeline_zorder" ->
      """SELECT l_orderkey * 8 + l_linenumber AS rowid,
                CAST(list_sum([(((l_partkey >> i) & 1) << (2 * i))
                             + (((l_suppkey >> i) & 1) << (2 * i + 1))
                               FOR i IN range(16)]) AS BIGINT) AS z
         FROM lineitem""",

    // the whole PQ pipeline unrolled: the same two Lloyd rounds as
    // similarity_kmeans but keyed by subspace m (one shared seed table —
    // the seed hash ignores the subspace), then codes = per-(id, m)
    // argmin, ADC tables per query, and the summed-lookup ranking
    "similarity_pq_topk" ->
      """WITH x AS (SELECT vec_id AS id,
                      (generate_subscripts(embedding, 1) - 1) // 16 AS m,
                      (generate_subscripts(embedding, 1) - 1) % 16 AS pos,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
                    FROM embeddings),
          sd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % 16 AS INT) AS cid,
                   min(vec_id) AS id
                 FROM embeddings GROUP BY 1),
          c0 AS (SELECT x.m, sd.cid, x.pos, x.xq AS cq FROM sd JOIN x ON sd.id = x.id),
          d1 AS (SELECT x.id, x.m, c0.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c0 ON x.m = c0.m AND x.pos = c0.pos GROUP BY 1, 2, 3),
          a1 AS (SELECT id, m, cid FROM (SELECT id, m, cid,
                   row_number() OVER (PARTITION BY id, m ORDER BY d2, cid) AS rn FROM d1)
                 WHERE rn = 1),
          s1 AS (SELECT a1.m, a1.cid, x.pos, CAST(sum(x.xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a1 ON x.id = a1.id AND x.m = a1.m GROUP BY 1, 2, 3),
          c1 AS (SELECT c0.m, c0.cid, c0.pos,
                   COALESCE((s1.s - (((s1.s % s1.n) + s1.n) % s1.n)) // s1.n, c0.cq) AS cq
                 FROM c0 LEFT JOIN s1 ON c0.m = s1.m AND c0.cid = s1.cid AND c0.pos = s1.pos),
          d2i AS (SELECT x.id, x.m, c1.cid, sum((xq - cq) * (xq - cq)) AS d2
                  FROM x JOIN c1 ON x.m = c1.m AND x.pos = c1.pos GROUP BY 1, 2, 3),
          a2 AS (SELECT id, m, cid FROM (SELECT id, m, cid,
                   row_number() OVER (PARTITION BY id, m ORDER BY d2, cid) AS rn FROM d2i)
                 WHERE rn = 1),
          s2 AS (SELECT a2.m, a2.cid, x.pos, CAST(sum(x.xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a2 ON x.id = a2.id AND x.m = a2.m GROUP BY 1, 2, 3),
          c2 AS (SELECT c1.m, c1.cid, c1.pos,
                   COALESCE((s2.s - (((s2.s % s2.n) + s2.n) % s2.n)) // s2.n, c1.cq) AS cq
                 FROM c1 LEFT JOIN s2 ON c1.m = s2.m AND c1.cid = s2.cid AND c1.pos = s2.pos),
          codes AS (SELECT id AS nid, m, cid FROM (SELECT dd.id, dd.m, dd.cid,
                      row_number() OVER (PARTITION BY dd.id, dd.m ORDER BY dd.d2, dd.cid) AS rn
                    FROM (SELECT x.id, x.m, c2.cid, sum((xq - cq) * (xq - cq)) AS d2
                          FROM x JOIN c2 ON x.m = c2.m AND x.pos = c2.pos
                          GROUP BY 1, 2, 3) dd)
                    WHERE rn = 1),
          dt AS (SELECT x.id AS qid, c2.m, c2.cid, sum((x.xq - c2.cq) * (x.xq - c2.cq)) AS d2
                 FROM x JOIN c2 ON x.m = c2.m AND x.pos = c2.pos
                 WHERE x.id < 10 GROUP BY 1, 2, 3),
          sc AS (SELECT dt.qid, codes.nid, CAST(sum(dt.d2) AS BIGINT) AS dist
                 FROM codes JOIN dt ON codes.m = dt.m AND codes.cid = dt.cid
                 WHERE dt.qid <> codes.nid GROUP BY 1, 2),
          r AS (SELECT qid, nid, dist,
                  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rank
                FROM sc)
          SELECT qid, nid, dist, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""",

    // both Lloyd rounds unrolled: micro-unit quantization, md5-seeded
    // slots, argmin assignment (d2 then cid), floor-division centroid
    // mean via subtract-pmod (exactly divisible, so // is exact), empty
    // clusters keep the previous round's centroid
    "similarity_kmeans" ->
      """WITH x AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
                    FROM embeddings),
          sd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % 8 AS INT) AS cid,
                   min(vec_id) AS id
                 FROM embeddings GROUP BY 1),
          c0 AS (SELECT cid, pos, xq AS cq FROM sd JOIN x USING (id)),
          d1 AS (SELECT x.id, c0.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c0 USING (pos) GROUP BY 1, 2),
          a1 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d1)
                 WHERE rn = 1),
          s1 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a1 USING (id) GROUP BY 1, 2),
          c1 AS (SELECT c0.cid, c0.pos,
                   COALESCE((s1.s - (((s1.s % s1.n) + s1.n) % s1.n)) // s1.n, c0.cq) AS cq
                 FROM c0 LEFT JOIN s1 ON c0.cid = s1.cid AND c0.pos = s1.pos),
          d2i AS (SELECT x.id, c1.cid, sum((xq - cq) * (xq - cq)) AS d2
                  FROM x JOIN c1 USING (pos) GROUP BY 1, 2),
          a2 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d2i)
                 WHERE rn = 1),
          s2 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a2 USING (id) GROUP BY 1, 2),
          c2 AS (SELECT c1.cid, c1.pos,
                   COALESCE((s2.s - (((s2.s % s2.n) + s2.n) % s2.n)) // s2.n, c1.cq) AS cq
                 FROM c1 LEFT JOIN s2 ON c1.cid = s2.cid AND c1.pos = s2.pos),
          sz AS (SELECT cid, n FROM s2 WHERE pos = 0)
          SELECT c2.cid, c2.pos, c2.cq, COALESCE(sz.n, 0) AS n
          FROM c2 LEFT JOIN sz USING (cid)""",

    // the similarity_kmeans CTE chain (seeds → a1 → c1 → a2 → c2)
    // extended one step: a3 = integer-L2 assignment against the FINAL
    // centroids, then within-cluster cosine pairs — SemDedup end-to-end
    "dedup_semdedup_kmeans" ->
      """WITH x AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
                    FROM embeddings),
          sd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % 8 AS INT) AS cid,
                   min(vec_id) AS id
                 FROM embeddings GROUP BY 1),
          c0 AS (SELECT cid, pos, xq AS cq FROM sd JOIN x USING (id)),
          d1 AS (SELECT x.id, c0.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c0 USING (pos) GROUP BY 1, 2),
          a1 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d1)
                 WHERE rn = 1),
          s1 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a1 USING (id) GROUP BY 1, 2),
          c1 AS (SELECT c0.cid, c0.pos,
                   COALESCE((s1.s - (((s1.s % s1.n) + s1.n) % s1.n)) // s1.n, c0.cq) AS cq
                 FROM c0 LEFT JOIN s1 ON c0.cid = s1.cid AND c0.pos = s1.pos),
          d2i AS (SELECT x.id, c1.cid, sum((xq - cq) * (xq - cq)) AS d2
                  FROM x JOIN c1 USING (pos) GROUP BY 1, 2),
          a2 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d2i)
                 WHERE rn = 1),
          s2 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a2 USING (id) GROUP BY 1, 2),
          c2 AS (SELECT c1.cid, c1.pos,
                   COALESCE((s2.s - (((s2.s % s2.n) + s2.n) % s2.n)) // s2.n, c1.cq) AS cq
                 FROM c1 LEFT JOIN s2 ON c1.cid = s2.cid AND c1.pos = s2.pos),
          d3 AS (SELECT x.id, c2.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c2 USING (pos) GROUP BY 1, 2),
          a3 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d3)
                 WHERE rn = 1)
          SELECT a3a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
                 ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                   sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                        list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))), 6) AS cos
          FROM a3 a3a JOIN a3 a3b ON a3a.cid = a3b.cid AND a3a.id < a3b.id
          JOIN embeddings a ON a.vec_id = a3a.id
          JOIN embeddings b ON b.vec_id = a3b.id
          WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                     list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) >= 0.35 - 5e-7""",

    // hyperplane-quantized SemDedup: b = smallest integer with 2^b ≥
    // ceil(n/100) (integer comparison, never floating log2 — both
    // engines must pick the SAME b for the hash to mean anything), the
    // similarity_lsh_topk plane family, single-band cell = Σ bit_p·2^p,
    // then within-cell cosine pairs
    "dedup_semdedup_lsh" ->
      """WITH cc AS (SELECT CAST(ceil(count(*) / 100.0) AS BIGINT) AS cells
                     FROM embeddings),
          bb AS (SELECT GREATEST(1, (SELECT min(r.j) FROM range(1, 63) r(j)
                   WHERE (CAST(1 AS BIGINT) << CAST(r.j AS INT)) >= (SELECT cells FROM cc))) AS b),
          planes AS (SELECT p.p, j.j,
                       ((('0x' || substr(md5('plane-' || p.p || '-' || j.j), 1, 15))::BIGINT
                         % 2049) - 1024) / 1024.0 AS c
                     FROM (SELECT unnest(range(0, (SELECT b FROM bb))) AS p) p,
                          (SELECT unnest(range(0, 64)) AS j) j),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          dots AS (SELECT e.vec_id, pl.p, SUM(pl.c * e.v[pl.j + 1]) AS d
                   FROM e, planes pl GROUP BY e.vec_id, pl.p),
          cells AS (SELECT vec_id,
                      CAST(SUM((CASE WHEN d > 0 THEN 1::BIGINT ELSE 0::BIGINT END)
                          << CAST(p AS INT)) AS BIGINT) AS cell
                    FROM dots GROUP BY vec_id)
          SELECT ca.cell, a.vec_id AS id_a, b.vec_id AS id_b,
                 ROUND(list_dot_product(a.v, b.v) /
                   sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) AS cos
          FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
          JOIN e a ON a.vec_id = ca.vec_id
          JOIN e b ON b.vec_id = cb.vec_id
          WHERE list_dot_product(a.v, b.v) /
                sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.35 - 5e-7""",

    // identical CTE chain with k = ceil(n/100) from a scalar subquery
    // instead of the baked constant — the scaled-k (corpus-linear)
    // SemDedup configuration, hash-checked at whatever n the gate runs
    "dedup_semdedup_scaled" ->
      """WITH kk AS (SELECT CAST(ceil(count(*) / 100.0) AS BIGINT) AS k FROM embeddings),
          x AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS xq
                    FROM embeddings),
          sd AS (SELECT CAST(('0x' || substr(md5('kmeans-seed' || vec_id), 1, 15))::BIGINT % (SELECT k FROM kk) AS INT) AS cid,
                   min(vec_id) AS id
                 FROM embeddings GROUP BY 1),
          c0 AS (SELECT cid, pos, xq AS cq FROM sd JOIN x USING (id)),
          d1 AS (SELECT x.id, c0.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c0 USING (pos) GROUP BY 1, 2),
          a1 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d1)
                 WHERE rn = 1),
          s1 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a1 USING (id) GROUP BY 1, 2),
          c1 AS (SELECT c0.cid, c0.pos,
                   COALESCE((s1.s - (((s1.s % s1.n) + s1.n) % s1.n)) // s1.n, c0.cq) AS cq
                 FROM c0 LEFT JOIN s1 ON c0.cid = s1.cid AND c0.pos = s1.pos),
          d2i AS (SELECT x.id, c1.cid, sum((xq - cq) * (xq - cq)) AS d2
                  FROM x JOIN c1 USING (pos) GROUP BY 1, 2),
          a2 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d2i)
                 WHERE rn = 1),
          s2 AS (SELECT cid, pos, CAST(sum(xq) AS BIGINT) AS s, count(*) AS n
                 FROM x JOIN a2 USING (id) GROUP BY 1, 2),
          c2 AS (SELECT c1.cid, c1.pos,
                   COALESCE((s2.s - (((s2.s % s2.n) + s2.n) % s2.n)) // s2.n, c1.cq) AS cq
                 FROM c1 LEFT JOIN s2 ON c1.cid = s2.cid AND c1.pos = s2.pos),
          d3 AS (SELECT x.id, c2.cid, sum((xq - cq) * (xq - cq)) AS d2
                 FROM x JOIN c2 USING (pos) GROUP BY 1, 2),
          a3 AS (SELECT id, cid FROM (SELECT id, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM d3)
                 WHERE rn = 1)
          SELECT a3a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
                 ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                   sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                        list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))), 6) AS cos
          FROM a3 a3a JOIN a3 a3b ON a3a.cid = a3b.cid AND a3a.id < a3b.id
          JOIN embeddings a ON a.vec_id = a3a.id
          JOIN embeddings b ON b.vec_id = a3b.id
          WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) *
                     list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) >= 0.35 - 5e-7""",

    // k-th smallest distinct md5-60 hash per source reproduces the KMV
    // estimate exactly; below k the sketch is exact (= max(rn))
    "sketch_kmv_distinct" ->
      """WITH t AS (SELECT source, doc_id,
                      unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
                    FROM documents),
          ht AS (SELECT DISTINCT source,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM t),
          hd AS (SELECT DISTINCT source,
                   ('0x' || substr(md5(tok || '|' || doc_id), 1, 15))::BIGINT AS h
                 FROM t),
          rt AS (SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM ht),
          rd AS (SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hd),
          kt AS (SELECT source, CASE WHEN max(rn) < 128 THEN CAST(max(rn) AS DOUBLE)
                   ELSE 127.0 * 1152921504606846976.0 / max(CASE WHEN rn = 128 THEN h END)
                   END AS est
                 FROM rt WHERE rn <= 128 GROUP BY source),
          kd AS (SELECT source, CASE WHEN max(rn) < 128 THEN CAST(max(rn) AS DOUBLE)
                   ELSE 127.0 * 1152921504606846976.0 / max(CASE WHEN rn = 128 THEN h END)
                   END AS est
                 FROM rd WHERE rn <= 128 GROUP BY source),
          ex AS (SELECT source, count(DISTINCT tok) AS n_tok_exact,
                   count(DISTINCT tok || '|' || doc_id) AS n_tokdoc_exact
                 FROM t GROUP BY source)
          SELECT ex.source, n_tok_exact, ROUND(kt.est, 4) AS kmv_tok,
                 n_tokdoc_exact, ROUND(kd.est, 4) AS kmv_tokdoc
          FROM ex JOIN kt USING (source) JOIN kd USING (source)""",

    // the classifier's two GD steps unrolled: w=0,b=0 → p=0.5 (err0),
    // bucket gradient + bias step → w1,b1 → margins → err1 → w2,b2 →
    // final sigmoid scores. Same md5-60 buckets, same L1-normalized
    // 1+2-gram features, lr=5, n = |documents|.
    "pipeline_quality_classifier" ->
      """WITH tok AS (SELECT doc_id,
                        string_split_regex(trim(lower(text)), '\s+') AS w
                      FROM documents),
          lab AS (SELECT doc_id, CASE WHEN list_contains(w, 'spark')
                    THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
                  FROM tok),
          g AS (SELECT doc_id, unnest(w) AS gram FROM tok
                UNION ALL
                SELECT doc_id, unnest(CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                  ELSE [] END) AS gram FROM tok),
          db AS (SELECT doc_id,
                   ('0x' || substr(md5(gram), 1, 15))::BIGINT % 64 AS bucket,
                   count(*) AS c
                 FROM g GROUP BY 1, 2),
          dt AS (SELECT doc_id, sum(c) AS tot FROM db GROUP BY 1),
          feat AS (SELECT db.doc_id, bucket, CAST(c AS DOUBLE) / tot AS x
                   FROM db JOIN dt USING (doc_id)),
          nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lab),
          e0 AS (SELECT doc_id, 0.5 - y AS err FROM lab),
          w1 AS (SELECT bucket, -5.0 * sum(err * x) / (SELECT n FROM nn) AS w
                 FROM feat JOIN e0 USING (doc_id) GROUP BY bucket),
          b1 AS (SELECT -5.0 * sum(err) / (SELECT n FROM nn) AS b FROM e0),
          xw1 AS (SELECT doc_id, sum(x * w1.w) AS sw
                  FROM feat JOIN w1 USING (bucket) GROUP BY doc_id),
          e1 AS (SELECT lab.doc_id, y,
                   1.0/(1.0 + exp(-((SELECT b FROM b1) + COALESCE(sw, 0.0)))) - y AS err
                 FROM lab LEFT JOIN xw1 USING (doc_id)),
          w2 AS (SELECT bucket,
                   w1.w - 5.0 * sum(err * x) / (SELECT n FROM nn) AS w
                 FROM feat JOIN e1 USING (doc_id) JOIN w1 USING (bucket)
                 GROUP BY bucket, w1.w),
          b2 AS (SELECT (SELECT b FROM b1)
                   - 5.0 * sum(err) / (SELECT n FROM nn) AS b FROM e1),
          xw2 AS (SELECT doc_id, sum(x * w2.w) AS sw
                  FROM feat JOIN w2 USING (bucket) GROUP BY doc_id)
          SELECT lab.doc_id, y,
                 ROUND(1.0/(1.0 + exp(-((SELECT b FROM b2) + COALESCE(sw, 0.0)))), 6)
                   AS score
          FROM lab LEFT JOIN xw2 USING (doc_id)""",

    // mirrors gopherQuality rule-for-rule; DuckDB trim() strips spaces
    // only, but the seeded text never starts/ends with a newline, so the
    // tokenizations agree (same discipline as every other text oracle)
    "text_gopher_quality" ->
      """WITH s AS (SELECT doc_id,
              array_to_string(
                [text]
                || CASE WHEN doc_id % 4 = 0
                     THEN ['- bullet item one', '* bullet item two',
                           '- bullet item three']
                     ELSE CAST([] AS VARCHAR[]) END
                || CASE WHEN doc_id % 3 = 0
                     THEN ['A trailing thought goes on...']
                     ELSE CAST([] AS VARCHAR[]) END, chr(10))
              || CASE WHEN doc_id % 5 = 0
                   THEN chr(10) || '# ## ### more... stuff...'
                   ELSE '' END AS t
            FROM documents),
          m AS (SELECT doc_id,
              string_split_regex(trim(t), '\s+') AS toks,
              [trim(l) FOR l IN string_split(t, chr(10))] AS lines,
              t
            FROM s),
          v AS (SELECT doc_id,
              CAST(len(toks) AS DOUBLE) AS nw,
              CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE)
                / GREATEST(CAST(len(toks) AS DOUBLE), 1.0) AS mean_len,
              CAST(len(regexp_extract_all(t, '#'))
                 + len(regexp_extract_all(t, '\.\.\.')) AS DOUBLE)
                / GREATEST(CAST(len(toks) AS DOUBLE), 1.0) AS sym,
              CAST(len(list_filter(lines, l ->
                  starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
                / GREATEST(CAST(len(lines) AS DOUBLE), 1.0) AS bul,
              CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
                / GREATEST(CAST(len(lines) AS DOUBLE), 1.0) AS ell,
              CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                / GREATEST(CAST(len(toks) AS DOUBLE), 1.0) AS alpha,
              len(list_filter(['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
                  sw -> list_contains(string_split_regex(trim(lower(t)), '\s+'), sw)))
                AS nstop
            FROM m)
          SELECT doc_id,
            CAST(nw AS BIGINT) AS n_words,
            ROUND(mean_len, 6) AS mean_word_len,
            ROUND(sym, 6) AS symbol_ratio,
            ROUND(bul, 6) AS bullet_ratio,
            ROUND(ell, 6) AS ellipsis_ratio,
            ROUND(alpha, 6) AS alpha_frac,
            nstop AS n_stopwords,
            CAST(nw >= 50 AND nw <= 100000
              AND mean_len >= 3.0 AND mean_len <= 10.0
              AND sym <= 0.1 AND bul < 0.9 AND ell < 0.3
              AND alpha >= 0.8 AND nstop >= 2 AS INT) AS gopher_pass
          FROM v""",

    // seqLen=128; // is DuckDB floor division (all operands non-negative);
    // tk[a+1 : a+len] mirrors Spark slice(toks, a+1, len)
    "pipeline_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
              string_split_regex(trim(text), '\s+') AS tk
            FROM documents WHERE len(trim(text)) > 0),
          n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
                FROM t WHERE len(tk) > 0),
          c AS (SELECT doc_id, tk, n,
              CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
            FROM n),
          x AS (SELECT doc_id, tk, n, cum,
              unnest(generate_series(cum // 128, (cum + n - 1) // 128)) AS seq_id
            FROM c),
          y AS (SELECT seq_id, doc_id,
              GREATEST(0, cum - seq_id * 128) AS seq_offset,
              GREATEST(0, seq_id * 128 - cum) AS ds,
              LEAST(n, (seq_id + 1) * 128 - cum)
                - GREATEST(0, seq_id * 128 - cum) AS sl,
              tk
            FROM x)
          SELECT seq_id, doc_id, seq_offset,
                 ds AS doc_tok_start, sl AS n_toks,
                 array_to_string(tk[ds + 1 : ds + sl], ' ') AS span_text
          FROM y""",

    "text_pii_scrub" ->
      """WITH s AS (SELECT doc_id,
                      text || ' contact doc' || CAST(doc_id AS VARCHAR)
                           || '@example.com or 555-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                        AS seeded
                    FROM documents)
          SELECT doc_id,
            len(regexp_extract_all(seeded,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
            len(regexp_extract_all(seeded, '[0-9]{3}-[0-9]{4}')) AS n_phones,
            len(regexp_extract_all(seeded, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips,
            regexp_replace(regexp_replace(regexp_replace(seeded,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
              '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g') AS scrubbed
          FROM s""",

    // smoothed TF-IDF: tf * (ln((N+1)/(df+1)) + 1); the rank compares
    // the ROUNDED score (term-asc tiebreak) so both engines agree
    "text_tfidf_topk" ->
      """WITH t AS (SELECT doc_id,
              unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
            FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
          df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
          sc AS (SELECT tf.doc_id, tf.term,
                   round(tf.tf * (ln((n.n + 1) / (df.df + 1)) + 1), 6) AS tfidf
                 FROM tf JOIN df USING (term) CROSS JOIN n),
          r AS (SELECT doc_id, term, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, term ASC) AS rank
                FROM sc)
          SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
          FROM r WHERE rank <= 3""",

    // exact nearest-rank percentiles of the token-count distribution
    "pipeline_percentiles" ->
      """WITH c AS (SELECT CAST(len(string_split_regex(trim(text), '\s+'))
                      AS BIGINT) AS v FROM documents),
          h AS (SELECT v, count(*) AS cnt FROM c GROUP BY v),
          cu AS (SELECT v, sum(cnt) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cum FROM h),
          n AS (SELECT count(*) AS n FROM c),
          p AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)
          SELECT CAST(p.p AS DOUBLE) AS p, min(cu.v) AS value
          FROM p CROSS JOIN n JOIN cu ON cu.cum >= CEIL(p.p * n.n)
          GROUP BY p.p""",

    // ground truth: full inverted index over snippet and corpus
    // shingles, containment decided by the same cross-multiply
    "dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
          sn AS (SELECT doc_id AS pid, w[1:30] AS w FROM t WHERE doc_id % 50 = 0),
          sa0 AS (SELECT pid,
                    list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
                  FROM sn WHERE len(w) >= 3),
          sa AS (SELECT DISTINCT pid, unnest(shs) AS shingle FROM sa0),
          sb0 AS (SELECT doc_id AS id,
                    list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
                  FROM t WHERE len(w) >= 3),
          sb AS (SELECT DISTINCT id, unnest(shs) AS shingle FROM sb0),
          na AS (SELECT pid, COUNT(*) AS n_a FROM sa GROUP BY pid),
          cm AS (SELECT sa.pid, sb.id, COUNT(*) AS inter
                 FROM sa JOIN sb USING (shingle) GROUP BY 1, 2)
          SELECT cm.pid AS probe_id, cm.id AS doc_id,
                 ROUND(CAST(inter AS DOUBLE) / CAST(na.n_a AS DOUBLE), 6)
                   AS containment
          FROM cm JOIN na USING (pid)
          WHERE CAST(inter AS DOUBLE) >= 0.9 * na.n_a""",

    "pipeline_corpus_diff" ->
      """WITH f AS (SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM documents),
          o AS (SELECT doc_id, fp FROM f WHERE doc_id % 7 <> 0),
          n AS (SELECT doc_id,
                  CASE WHEN doc_id % 11 = 0 THEN
                    md5(regexp_replace(lower(trim(text || ' v2')), '\s+', ' ', 'g'))
                  ELSE fp END AS fp
                FROM f JOIN documents USING (doc_id))
          SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                 CASE WHEN o.doc_id IS NULL THEN 'added'
                      WHEN n.doc_id IS NULL THEN 'removed'
                      WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
                      ELSE 'changed' END AS status
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",

    "sketch_cms_tokens" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                        AS token FROM documents),
          c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
          t20 AS (SELECT token, cnt, rank FROM (
                    SELECT token, cnt, row_number() OVER
                      (ORDER BY cnt DESC, token ASC) AS rank FROM c)
                  WHERE rank <= 20),
          ds AS (SELECT unnest(range(0, 4)) AS depth),
          tb AS (SELECT depth,
                   ('0x' || substr(md5('cms' || CAST(depth AS VARCHAR) || token), 1, 15))::BIGINT
                     % 512 AS bucket
                 FROM tok, ds),
          cms AS (SELECT depth, bucket, count(*) AS bc FROM tb GROUP BY 1, 2),
          kb AS (SELECT token, depth,
                   ('0x' || substr(md5('cms' || CAST(depth AS VARCHAR) || token), 1, 15))::BIGINT
                     % 512 AS bucket
                 FROM t20, ds),
          est AS (SELECT kb.token, MIN(COALESCE(cms.bc, 0)) AS cms_est
                  FROM kb LEFT JOIN cms USING (depth, bucket)
                  GROUP BY kb.token)
          SELECT t20.token, t20.cnt, est.cms_est, CAST(t20.rank AS INT) AS rank
          FROM t20 JOIN est USING (token)""",

    // HLL mirror: registers from j = h % 512, rho = 52 − bitlength(h//512)
    // (bin() gives the minimal binary string on both engines; w=0 is the
    // all-zero-suffix special case), dyadic BIGINT register sum, then the
    // identical alpha/linear-counting op chain as the aggregate's eval
    "sketch_hll_distinct" ->
      """WITH t AS (SELECT source, doc_id,
                      string_split_regex(trim(lower(text)), '\s+') AS w
                    FROM documents),
          o AS (SELECT source, doc_id, generate_subscripts(w, 1) - 1 AS pos,
                  unnest(w) AS tok
                FROM t),
          ht AS (SELECT DISTINCT source,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM o),
          ho AS (SELECT source,
                   ('0x' || substr(md5(tok || '#' || doc_id || '#' || pos), 1, 15))::BIGINT AS h
                 FROM o),
          rt AS (SELECT source, h % 512 AS j,
                   max(CASE WHEN h // 512 = 0 THEN 52
                       ELSE 52 - length(bin(h // 512)) END) AS mj
                 FROM ht GROUP BY 1, 2),
          ro AS (SELECT source, h % 512 AS j,
                   max(CASE WHEN h // 512 = 0 THEN 52
                       ELSE 52 - length(bin(h // 512)) END) AS mj
                 FROM ho GROUP BY 1, 2),
          srcs AS (SELECT DISTINCT source FROM t),
          grid AS (SELECT source, i.i AS j FROM srcs, range(512) i(i)),
          st AS (SELECT grid.source,
                   sum(1::BIGINT << (52 - COALESCE(mj, 0))) AS s,
                   sum(CASE WHEN COALESCE(mj, 0) = 0 THEN 1 ELSE 0 END) AS v
                 FROM grid LEFT JOIN rt ON grid.source = rt.source AND grid.j = rt.j
                 GROUP BY 1),
          so AS (SELECT grid.source,
                   sum(1::BIGINT << (52 - COALESCE(mj, 0))) AS s,
                   sum(CASE WHEN COALESCE(mj, 0) = 0 THEN 1 ELSE 0 END) AS v
                 FROM grid LEFT JOIN ro ON grid.source = ro.source AND grid.j = ro.j
                 GROUP BY 1),
          et AS (SELECT source,
                   CASE WHEN 0.7213 / (1.0 + 1.079 / 512.0) * 512 * 512
                          * 4503599627370496.0 / CAST(s AS DOUBLE) <= 2.5 * 512
                          AND v > 0
                     THEN 512.0 * ln(512.0 / CAST(v AS DOUBLE))
                     ELSE 0.7213 / (1.0 + 1.079 / 512.0) * 512 * 512
                          * 4503599627370496.0 / CAST(s AS DOUBLE) END AS est
                 FROM st),
          eo AS (SELECT source,
                   CASE WHEN 0.7213 / (1.0 + 1.079 / 512.0) * 512 * 512
                          * 4503599627370496.0 / CAST(s AS DOUBLE) <= 2.5 * 512
                          AND v > 0
                     THEN 512.0 * ln(512.0 / CAST(v AS DOUBLE))
                     ELSE 0.7213 / (1.0 + 1.079 / 512.0) * 512 * 512
                          * 4503599627370496.0 / CAST(s AS DOUBLE) END AS est
                 FROM so),
          ex AS (SELECT source, count(DISTINCT tok) AS n_tok_exact,
                   count(*) AS n_occ_exact
                 FROM o GROUP BY source)
          SELECT ex.source, n_tok_exact, ROUND(et.est, 4) AS hll_tok,
                 n_occ_exact, ROUND(eo.est, 4) AS hll_occ
          FROM ex JOIN et USING (source) JOIN eo USING (source)""",

    // BM25 mirror: every arithmetic step is the identical IEEE op chain
    // (k1+1 and 1-b written as the same sums the plan folds; avgdl is an
    // exactly-rounded integer division); per-term floor-to-micros before
    // the integer sum removes float-summation-order sensitivity
    "text_bm25_topk" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
          l AS (SELECT doc_id, len(tk) AS dl FROM t),
          st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                 FROM l),
          q AS (SELECT doc_id AS query_id, unnest(list_distinct(tk[1:5])) AS term
                FROM t WHERE doc_id % 100 = 0),
          occ AS (SELECT doc_id, unnest(tk) AS term FROM t),
          p AS (SELECT occ.doc_id, occ.term, count(*) AS tf
                FROM occ JOIN (SELECT DISTINCT term FROM q) qv USING (term)
                GROUP BY 1, 2),
          f AS (SELECT term, count(*) AS df FROM p GROUP BY term),
          c AS (SELECT q.query_id, p.doc_id,
                  CAST(FLOOR(ln(1.0 + (st.n - f.df + 0.5) / (f.df + 0.5))
                    * p.tf * (1.2 + 1.0)
                    / (p.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / st.avgdl))
                    * 1000000.0) AS BIGINT) AS m
                FROM q JOIN p USING (term) JOIN f USING (term)
                     JOIN l ON p.doc_id = l.doc_id, st),
          s AS (SELECT query_id, doc_id, CAST(sum(m) AS BIGINT) AS score_micro
                FROM c GROUP BY 1, 2),
          r AS (SELECT query_id, doc_id, score_micro,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY score_micro DESC, doc_id ASC) AS rank
                FROM s)
          SELECT query_id, doc_id, score_micro, CAST(rank AS INT) AS rank
          FROM r WHERE rank <= 10""",

    // UNFILTERED inverted-index ground truth at t=0.6 — a hash match
    // proves the Spark side's prefix filter is recall-complete. The
    // threshold test is the same cross-multiply (no division) the plan
    // runs; the reported jaccard divides only for display, rounded.
    "dedup_prefix_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
          sh AS (SELECT DISTINCT doc_id AS id,
                   list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
                 FROM t WHERE len(w) >= 3),
          e AS (SELECT DISTINCT id, unnest(shs) AS shingle FROM sh),
          sz AS (SELECT id, COUNT(*) AS n_sh FROM e GROUP BY id),
          cm AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
                 FROM e a JOIN e b ON a.shingle = b.shingle AND a.id < b.id
                 GROUP BY 1, 2)
          SELECT id_a, id_b,
                 ROUND(CAST(inter AS DOUBLE)
                   / CAST(na.n_sh + nb.n_sh - inter AS DOUBLE), 6) AS jaccard
          FROM cm JOIN sz na ON na.id = id_a JOIN sz nb ON nb.id = id_b
          WHERE CAST(inter AS DOUBLE) >= 0.6 * (na.n_sh + nb.n_sh - inter)""",

    // brute-force banded ground truth (the |Δlen| ≤ 4 prefilter is
    // implied by ed ≤ 4 — it only speeds DuckDB up, never changes the
    // result); both engines implement classic unit-cost Levenshtein
    "dedup_editdistance" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                levenshtein(a.text, b.text) AS edit_dist
         FROM documents a JOIN documents b
           ON a.doc_id < b.doc_id
          AND abs(length(a.text) - length(b.text)) <= 4
         WHERE levenshtein(a.text, b.text) <= 4""",

    "pipeline_stratified_sample" ->
      """WITH h AS (SELECT doc_id, source,
                ('0x' || substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  AS hv
              FROM documents),
          r AS (SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
                FROM h)
          SELECT doc_id, source, CAST(rn AS INT) AS pick FROM r WHERE rn <= 20""",

    "pipeline_source_cap" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
               FROM documents)
         SELECT doc_id, source, n_chars, CAST(rn AS INT) AS cap_rank
         FROM r WHERE rn <= 50""",

    // same seed codepoints built with chr() so the oracle file stays
    // ASCII: 769 = COMBINING ACUTE, 8491 = ANGSTROM SIGN, 7 = BEL
    "text_unicode_clean" ->
      """SELECT doc_id,
           regexp_replace(
             nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(8491)
               || chr(7) || 'x' || CAST(doc_id AS VARCHAR)),
             '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g') AS clean_text
         FROM documents""")
}
