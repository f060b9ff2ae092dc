package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and split assignment for
  * training-data pipelines (beyond-reference surface, SURVEY §7.1.8):
  * the standard way to carve a 100 TB corpus into reproducible samples
  * and train/validation/test splits WITHOUT a global shuffle or a
  * random() that changes between runs — every decision is a pure
  * function of the row's key, so reruns, backfills, and incremental
  * appends land each document in the same bucket forever.
  *
  * Hashing is [[Dedup.md5Hash60]] (md5 → 60-bit int) rather than
  * xxhash64 so the assignment is engine-portable — DuckDB reproduces it
  * closed-form, which keeps these operators hash-checkable end-to-end.
  * Narrow transformations only: no shuffle, no driver state.
  */
object Sampling {

  /** Stable per-key bucket in [0, buckets). A salt namespaces
    * independent decisions (sampling vs splitting) off one key. */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(Dedup.md5Hash60(concat(lit(salt), key.cast("string"))), lit(buckets.toLong))

  /** Keep a deterministic `percent`% of rows by key. */
  def deterministicSample(df: DataFrame, keyCol: String, percent: Int,
      salt: String = "sample"): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.filter(hashBucket(col(keyCol), 100, salt) < percent)
  }

  /** Assign train/validation/test splits by key hash: bucket < trainPct →
    * train, < trainPct+valPct → validation, else test. */
  def splitAssign(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10, salt: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = hashBucket(col(keyCol), 100, salt)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("validation"))
        .otherwise(lit("test")))
  }

  /** Token-budget sharding: assign each document (in ascending `idCol`
    * order) to the shard holding its cumulative token count —
    * `shard = floor(tokens-before-this-doc / budget)` — the standard way
    * a pretraining pipeline carves a corpus into fixed-token-budget
    * output files with stable, reproducible boundaries.
    *
    * A global running sum is the textbook sequential trap; this is the
    * two-pass distributed prefix sum: range-partition by id (so partition
    * order is id order), per-partition exclusive running sums in
    * parallel, then ONE tiny aggregation (a row per partition) windowed
    * on the driver-sized side and broadcast back as offsets. At 100 TB
    * the only non-parallel step remains O(#partitions), not O(#docs).
    * (Catalyst re-hashes on __pid for the per-partition window — a second
    * exchange — but both shuffles move only (id, count) pairs, never
    * document text.) */
  def tokenShards(docs: DataFrame, budget: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val t = docs
      .select(col(idCol), TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"))
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
    // per-partition totals: #partitions rows — the single-partition window
    // below runs over THAT, not the corpus
    val offsets = t.groupBy("__pid").agg(sum("__n").as("__psum"))
      .withColumn("__off", coalesce(sum("__psum").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val localCum = sum("__n").over(
      Window.partitionBy("__pid").orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1))
    t.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__cum", coalesce(localCum, lit(0L)) + col("__off"))
      .select(col(idCol), col("__n").as("n_tokens"),
        floor(col("__cum") / budget).as("shard"))
  }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining step
    * that lays every document's tokens end-to-end (in ascending `idCol`
    * order) and cuts the stream into fixed `seqLen`-token training
    * sequences; a document crossing a boundary is split across the two
    * sequences. One output row per (sequence, document) span:
    * `seq_id`, the 0-based `seq_offset` where the span starts inside the
    * sequence, the 0-based `doc_tok_start` inside the document, the span
    * length `n_toks`, and the span text itself.
    *
    * The global positions come from the SAME two-pass distributed prefix
    * sum as [[tokenShards]] (per-partition running sums + one
    * #partitions-row offset window) — no global single-partition window,
    * no driver loop. The span explode is per-row arithmetic: a document
    * of n tokens touches ⌈n/seqLen⌉+1 sequences at most, so output
    * volume is bounded by input token volume. Documents with zero tokens
    * pack nothing and are dropped (nothing to train on). */
  def packSequences(docs: DataFrame, seqLen: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val t = docs
      // both engines tokenize '' to [''] — drop whitespace-only docs first
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), TextAnalysis.tokens(trim(col(textCol))).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
    val offsets = t.groupBy("__pid").agg(sum("__n").as("__psum"))
      .withColumn("__off", coalesce(sum("__psum").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val localCum = sum("__n").over(
      Window.partitionBy("__pid").orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1))
    val L = lit(seqLen.toLong)
    t.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__cum", coalesce(localCum, lit(0L)) + col("__off"))
      // sequences this document touches: floor(cum/L) .. floor((cum+n-1)/L)
      .select(col(idCol), col("__toks"), col("__n"), col("__cum"),
        explode(sequence(floor(col("__cum") / L),
          floor((col("__cum") + col("__n") - 1L) / L))).as("seq_id"))
      .withColumn("__docStart", greatest(lit(0L), col("seq_id") * L - col("__cum")))
      .withColumn("__spanLen",
        least(col("__n"), (col("seq_id") + 1L) * L - col("__cum")) - col("__docStart"))
      .select(col("seq_id"), col(idCol),
        greatest(lit(0L), col("__cum") - col("seq_id") * L).as("seq_offset"),
        col("__docStart").as("doc_tok_start"),
        col("__spanLen").as("n_toks"),
        array_join(slice(col("__toks"),
          col("__docStart").cast(IntegerType) + 1,
          col("__spanLen").cast(IntegerType)), " ").as("span_text"))
  }

  /** Domain-mixing sampler: keep a different deterministic percentage per
    * group (the per-source mixture weights every corpus recipe specifies —
    * e.g. C4 at 20%, code at 100%). Groups absent from `percents` get
    * `defaultPercent`. Still one narrow filter — the per-group rate just
    * selects the threshold the row's hash bucket is compared against; no
    * shuffle, no per-group pass. */
  def weightedSample(df: DataFrame, keyCol: String, groupCol: String,
      percents: Map[String, Int], defaultPercent: Int = 100,
      salt: String = "mix"): DataFrame = {
    require((defaultPercent +: percents.values.toSeq).forall(p => p >= 0 && p <= 100),
      "percents must be in [0, 100]")
    val threshold = percents.foldLeft(lit(defaultPercent)) {
      case (acc, (g, p)) => when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100, salt) < threshold)
  }

  /** Temperature-based source mixing — the standard multi-corpus
    * reweighting (multinomial sampling with p_src ∝ n_src^α, α ∈ (0, 1]):
    * per-document keep rate (n_src / n_min)^(α−1), so the SMALLEST source
    * keeps 100 % and larger sources are downsampled toward balance; α = 1
    * keeps everything (proportional mixing), α → 0 approaches uniform
    * source shares. Decision stays a pure function of the document key
    * (engine-portable md5 hash vs the rate), so reruns and incremental
    * appends keep every document's fate stable. Cost: one tiny
    * per-source count aggregate broadcast back — no global shuffle of
    * the corpus itself. */
  def temperatureMix(df: DataFrame, keyCol: String, srcCol: String,
      alpha: Double, salt: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha must be in (0, 1]")
    val counts = df.groupBy(srcCol).agg(count(lit(1)).cast("double").as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__minN"))))
      .select(col(srcCol), pow(col("__n") / col("__minN"), alpha - 1).as("__rate"))
    df.join(broadcast(rates), srcCol)
      .filter(md5Hash60OfKey(col(keyCol), salt).cast("double") <
        col("__rate") * lit(1152921504606846976.0)) // 2^60
      .drop("__rate")
  }

  /** Exact-quota stratified sample: the hash-smallest `quota` rows of
    * every stratum (order: md5-60 of salt+key, key as tiebreak). Unlike
    * the rate-based samplers above this guarantees EXACTLY
    * min(quota, |stratum|) rows per stratum — the eval-set carve-out /
    * per-domain cap shape — while staying a pure function of the key set
    * (append-only growth of a stratum only ever evicts the largest
    * hashes, and reruns are bit-stable).
    *
    * Scale shape: a per-stratum `row_number` window alone would funnel a
    * 100 TB stratum through one task, so a broadcast pre-filter bounds
    * the window's input first: per-stratum counts (tiny aggregate) set a
    * hash threshold keeping ~`margin`·quota expected rows, and only
    * those survivors are ranked. The margin-4 Chernoff tail puts
    * under-selection below 10⁻¹⁵ per stratum; if it EVER happens (or the
    * hash space is pathologically skewed) the result would silently lose
    * rows, so the quota shortfall is verified with one more tiny
    * aggregate and the operator throws rather than under-sample. */
  def stratifiedSample(df: DataFrame, quota: Int, strataCol: String,
      keyCol: String, salt: String = "strat", margin: Double = 4.0): DataFrame = {
    require(quota >= 1, s"stratifiedSample quota $quota must be >= 1")
    require(margin >= 1.0, s"stratifiedSample margin $margin must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // null keys hash through a reserved sentinel (so they sort
    // deterministically instead of silently vanishing on a null hash);
    // null strata are a stratum like any other (null-safe join below)
    val hv = md5Hash60OfKey(
      coalesce(col(keyCol).cast("string"), lit("\u0000")), salt)
    val h = df.withColumn("__hv", hv)
    val counts = h.groupBy(strataCol).agg(count(lit(1)).as("__ns"))
    // keep-all strata below the prefilter's payoff point; larger strata
    // keep hashes under margin*quota/n_s of the 2^60 space
    val thr = when(col("__ns") <= lit((quota * margin).toLong + 1L), lit(Long.MaxValue))
      .otherwise((lit(1152921504606846976.0) * lit(margin * quota) / col("__ns"))
        .cast("long"))
    val cnts = counts.withColumn("__thr", thr)
      .withColumnRenamed(strataCol, "__strat")
    val survivors0 = h.join(broadcast(cnts), col(strataCol) <=> col("__strat"))
      .filter(col("__hv") <= col("__thr")).drop("__strat")
    // the prefilter bounds survivors to ~margin·quota rows per stratum,
    // so ONE materialization here lets the shortfall check AND the
    // result share a single pass over the corpus (the operator is
    // deliberately eager, like incrementalExactDedup's Bloom build)
    val survivors = survivors0.localCheckpoint()
    val w = Window.partitionBy(strataCol).orderBy(col("__hv").asc, col(keyCol).asc)
    val ranked = survivors.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
    // loud under-sampling guard, FROM the counts side: a stratum whose
    // rows were all prefiltered away must surface as 0-got, not vanish
    val got = ranked.groupBy(strataCol).agg(count(lit(1)).as("__got"))
      .withColumnRenamed(strataCol, "__strat")
    val short = cnts.join(got, cnts("__strat") <=> got("__strat"), "left_outer")
      .filter(coalesce(col("__got"), lit(0L)) < least(lit(quota.toLong), col("__ns")))
      .limit(1).collect()
    if (short.nonEmpty)
      throw new IllegalStateException(
        s"stratifiedSample: stratum ${short.head.get(0)} under-sampled after " +
          s"prefilter (margin=$margin too tight for this hash distribution)")
    ranked.withColumn("pick", col("__rn")).drop("__hv", "__rn", "__ns", "__thr")
  }

  /** Quality-ranked per-group cap: keep the `n` best rows of every group
    * under an arbitrary ordering (quality desc, freshness desc, …) — the
    * ranked-retention counterpart to [[stratifiedSample]]'s uniform quota,
    * and the shape of a web-corpus "domain cap" (keep the N
    * highest-quality pages per domain). Because the ordering is
    * data-dependent, the hash-threshold prefilter above can't bound the
    * window input; the skew guard is instead a two-phase rank. Phase 1
    * ranks within (group, salt-cell) — `salts` deterministic cells per
    * group, hashed off `keyCol` — and keeps each cell's local top n, so
    * a 100 TB hot group funnels at most `salts`·n rows (not its whole
    * mass) into phase 2's per-group window. The result is identical to a
    * single global window: every global top-n row is necessarily in its
    * own cell's top n. `orderCols` + the `keyCol` tiebreak must be a
    * total order or ranks aren't reproducible.
    *
    * Output: input columns + `cap_rank` (1-based within group). */
  def topNPerGroup(df: DataFrame, n: Int, groupCol: String,
      orderCols: Seq[Column], keyCol: String, salts: Int = 16): DataFrame = {
    require(n >= 1, s"topNPerGroup n $n must be >= 1")
    require(salts >= 1, s"topNPerGroup salts $salts must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val order = orderCols :+ col(keyCol).asc
    val cell = Window.partitionBy(col(groupCol),
      hashBucket(col(keyCol), salts, "cap")).orderBy(order: _*)
    val local = df.withColumn("__lr", row_number().over(cell))
      .filter(col("__lr") <= n).drop("__lr")
    val w = Window.partitionBy(groupCol).orderBy(order: _*)
    local.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= n)
  }

  private def md5Hash60OfKey(key: Column, salt: String): Column =
    Dedup.md5Hash60(concat(lit(salt), key.cast("string")))
}
