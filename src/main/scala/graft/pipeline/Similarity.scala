package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the correctness oracle).
  * Scale path: IVF — k-means-lite coarse quantizer, then search only the
  * `nProbe` nearest inverted lists. At 100 TB the broadcast of ~centroids
  * (kB-MB) replaces the full cross join: candidate generation is a
  * broadcast-join + cluster-pruned shuffle, never n×m.
  */
object Similarity {

  /** Codegen cosine ([[graft.functions.CosineSimilarity]]); bitwise-equal
    * to the HOF formulation in [[Dedup.cosine]], but fused into
    * whole-stage codegen instead of interpreted per-element lambdas. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Exact brute-force top-k neighbors for each query vector.
    * Queries broadcast (they are the small side by construction). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
  }

  /** Deterministic k-means-lite centroids, refined with `iters` Lloyd
    * rounds. Returns (cid, centroid: array<double>). Runs as DF
    * aggregations — no collect of vectors besides the k centroids
    * themselves.
    *
    * Seeding: each id hashes to a cluster slot and the minimum id per slot
    * becomes that slot's seed — one narrow scan plus a (cid, id) groupBy,
    * no global window (a `Window.orderBy` with no partition funnels the
    * whole corpus through one task; that was round 1's IVF scale-killer). */
  def trainCentroids(corpus: DataFrame, nClusters: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val seedIds = corpus
      .select(col(idCol).as("id"),
        pmod(xxhash64(lit("ivf-seed"), col(idCol)), lit(nClusters)).cast(IntegerType).as("cid"))
      .groupBy("cid").agg(min(col("id")).as("id"))
    var centroids = corpus.join(broadcast(seedIds), corpus(idCol) === seedIds("id"))
      .select(col("cid"), transform(col(vecCol), _.cast(DoubleType)).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(corpus, centroids, idCol, vecCol)
      centroids = corpus.join(assigned, idCol)
        .select(col("cid"), posexplode(col(vecCol)))
        .groupBy("cid", "pos").agg(avg(col("col")).as("m"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), x => x.getField("m")).as("centroid"))
    }
    // stays lazy: downstream broadcast references re-evaluate the chain,
    // but at bench scale duplicated subplans inside ONE action beat the
    // extra blocking action a collect/checkpoint would add (measured:
    // eager variants were 1.7-2.5× slower end-to-end)
    centroids
  }

  /** Assign each corpus vector to its nearest centroid: broadcast join +
    * max_by aggregate (one shuffle of (id, cid) pairs; ties break to the
    * lowest cid). */
  /** Integer-L2 nearest-centroid assignment against [[kmeansMicro]]
    * centroids (cid, pos, cq) — the SAME micro-unit arithmetic and
    * (d2, cid) tie-break the training loop uses, so DuckDB replays the
    * assignment exactly (the engine-portable counterpart of the cosine
    * [[assign]] below). One broadcast join + two aggregations. */
  def assignIntL2(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val x = corpus.select(col(idCol).as("id"),
      posexplode(transform(col(vecCol),
        v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType)))
        .as(Seq("pos", "xq")))
    x.join(broadcast(centroids.select("cid", "pos", "cq")), "pos")
      .groupBy("id", "cid")
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
      .groupBy("id")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      .select(col("id").as(idCol), col("cid"))
  }

  def assign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", cosine(col(vecCol), col("centroid")))
      .groupBy(idCol)
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * md5-derived (engine-portable — DuckDB reproduces it bit-for-bit from
    * `('0x'||substr(md5('plane-p-j'),1,15))::BIGINT % 2049`) and dyadic
    * (k/1024 is exact in binary, so the sign of the projection is
    * reproducible across engines). Evaluated ONCE driver-side — the
    * planes are constants, and evaluating the md5 inside the per-row
    * expression would redo nPlanes×dim digests per vector. */
  private def planeComponent(p: Int, j: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane-$p-$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(digest.substring(0, 15), 16)
    (Math.floorMod(h, 2049L) - 1024L).toDouble / 1024.0
  }

  /** Random-hyperplane LSH buckets `(id, band, bval)`: signature bit p =
    * [plane_p · v > 0], band value = the band's `nPlanes/bands` bits as an
    * integer. Vectors with high cosine agree on many bits, so they
    * collide in some band with high probability — candidate generation is
    * then a pure equi-join on (band, bval), the most cluster-friendly
    * blocking shape (no centroids to train, no broadcast state). */
  def lshBuckets(df: DataFrame, nPlanes: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    val rows = nPlanes / bands
    // loud runtime guard: a vector longer than the plane rows would index
    // the matrix out of range (ANSI error) or null-poison every dot into
    // bucket 0 (non-ANSI) with no hint at the dim mismatch
    val v = when(size(col(vecCol)) <= dim, col(vecCol)).otherwise(raise_error(
      concat(lit(s"lshBuckets: vector length "), size(col(vecCol)),
        lit(s" exceeds dim=$dim — pass the embedding dimension explicitly"))))
    // plane matrix as a plan literal: nPlanes×dim doubles, KB-sized;
    // indexed per element inside the fold
    val planes = typedLit((0 until nPlanes).map(p =>
      (0 until dim).map(j => planeComponent(p, j))))
    val dots = transform(sequence(lit(0), lit(nPlanes - 1)), p =>
      aggregate(sequence(lit(0), size(v) - 1), lit(0.0),
        (acc, j) => acc +
          element_at(element_at(planes, (p + 1).cast("int")), (j + 1).cast("int")) *
            element_at(v, j + 1).cast(DoubleType)))
    val bits = transform(dots, d => when(d > 0, lit(1L)).otherwise(lit(0L)))
    val powers = typedLit((0 until rows).map(r => 1L << r))
    df.select(col(idCol).as("id"), bits.as("__bits"))
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(sequence(lit(0), lit(rows - 1)), lit(0L), (acc, r) =>
          acc + element_at(col("__bits"), (b * rows + r + 1).cast("int")) *
            element_at(powers, (r + 1).cast("int"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval")
  }

  /** LSH-bucketed approximate top-k: candidates = bucket collisions in
    * any band (equi-join), then exact cosine ranking within candidates.
    * The second scale path beside [[ivfTopK]]; fully deterministic, so
    * the DuckDB oracle reproduces it end-to-end. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val cb = lshBuckets(corpus, nPlanes, bands, idCol, vecCol, dim)
    val qb = lshBuckets(queries, nPlanes, bands, idCol, vecCol, dim)
    val cand = qb.as("q").join(cb.as("c"),
        col("q.band") === col("c.band") && col("q.bval") === col("c.bval") &&
          col("q.id") =!= col("c.id"))
      .select(col("q.id").as("qid"), col("c.id").as("nid")).distinct()
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val nv = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    cand.join(broadcast(qv), Seq("qid")).join(nv, Seq("nid"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cos", "rank")
  }

  /** Distributed Lloyd's k-means whose TRAINING is hash-checkable — the
    * exact-arithmetic twin of [[trainCentroids]] (whose float `avg`
    * centroids are summation-order-dependent, so only its downstream
    * rankings can be oracle-checked, never the centroids themselves).
    *
    * Components quantize to integer micro-units (floor(v·10⁶)), so
    * per-round distances are exact BIGINT sums and the centroid update
    * is a FLOOR-division mean on the same grid: every round is
    * bit-reproducible in ANSI SQL (the oracle unrolls the rounds as
    * CTEs). Assignment ties break to the lowest cid; a cluster that
    * loses all members keeps its previous centroid (n = 0 in the
    * output).
    *
    * Scale shape per round: one broadcast of k·dim centroid rows, one
    * (id, cid) distance aggregation, one (cid, pos) sum — no global
    * windows, no driver-side loops over data. Returns
    * (cid, pos, cq, n) long-format centroids after `iters` rounds.
    *
    * |xq| ≤ ~2²¹ micro-units and d² ≤ dim·(2·2²¹)² ≈ 2⁵⁰ keep every
    * sum far from BIGINT range; the floor division computes as
    * (s − pmod(s, n)) / n, exact because s − pmod is divisible and
    * < 2⁵³ (double division of exactly divisible longs is exact). */
  /** Hash-seeded cluster slots (min id per slot, md5-portable — the
    * oracle reproduces the seeds): the deterministic seeding
    * [[kmeansMicro]] and [[pqTopK]] share. A slot no id hashes into
    * would silently train FEWER than k centroids (ADVICE r6) — fail
    * loudly instead, mirroring stratifiedSample's under-sampling guard.
    * An empty slot has probability ≈ k·(1−1/k)ⁿ, negligible when
    * k ≪ n, so a failure means k is too close to the corpus size.
    * Eager (k-row checkpoint + count); also saves the lazy plan's
    * second corpus scan through the seed groupBy. */
  private def seedSlots(corpus: DataFrame, idCol: String, k: Int): DataFrame = {
    val seeds = corpus.select(col(idCol).as("id"),
        pmod(Dedup.md5Hash60(concat(lit("kmeans-seed"), col(idCol).cast("string"))),
          lit(k.toLong)).cast(IntegerType).as("cid"))
      .groupBy("cid").agg(min(col("id")).as("id"))
      .localCheckpoint()
    val filled = seeds.count()
    require(filled == k, s"k-means seeding filled $filled of $k slots — " +
      "nClusters/ksub too close to the corpus size for hash seeding")
    seeds
  }

  def kmeansMicro(corpus: DataFrame, nClusters: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      /** Materialize the exploded corpus once and each round's k·dim
        * centroid table (tiny) — the per-round chain otherwise doubles
        * per iteration (each round reads the previous centroids twice:
        * the assignment join and the empty-cluster left join). Measured
        * at sf0.1/k=8: 3.0 s lazy → 1.3 s checkpointed. Off for
        * single-action composition into an outer plan. */
      checkpoint: Boolean = true): DataFrame = {
    require(nClusters >= 1 && iters >= 1, "kmeansMicro needs k >= 1, iters >= 1")
    val x0 = corpus.select(col(idCol).as("id"),
      posexplode(transform(col(vecCol),
        v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType)))
        .as(Seq("pos", "xq")))
    val x = if (checkpoint) x0.localCheckpoint() else x0
    val seedIds = seedSlots(corpus, idCol, nClusters)
    var cent = x.join(broadcast(seedIds), "id")
      .select(col("cid"), col("pos"), col("xq").as("cq"))
    var centOwn = false
    var sizes: DataFrame = null
    for (_ <- 0 until iters) {
      val assigned = x.join(broadcast(cent), "pos")
        .groupBy("id", "cid")
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
        .groupBy("id")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      val sums = x.join(assigned, "id")
        .groupBy("cid", "pos").agg(sum(col("xq")).as("s"), count(lit(1)).as("n"))
      val prev = cent
      val prevOwn = centOwn
      val next = cent.as("o").join(sums.as("u"), Seq("cid", "pos"), "left_outer")
        .select(col("cid"), col("pos"),
          coalesce(((col("u.s") - pmod(col("u.s"), col("u.n"))) / col("u.n"))
            .cast(LongType), col("o.cq")).as("cq"),
          coalesce(col("u.n"), lit(0L)).as("n"))
      val mat = if (checkpoint) next.localCheckpoint() else next
      cent = mat.select("cid", "pos", "cq")
      centOwn = checkpoint
      sizes = mat.filter(col("pos") === 0).select(col("cid"), col("n"))
      if (prevOwn) graft.reasoner.Reasoner.unpersistCheckpoint(prev)
    }
    cent.join(sizes, Seq("cid"), "left_outer")
      .select(col("cid"), col("pos"), col("cq"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid 2011) — the
    * standard billion-scale memory/bandwidth reduction: the vector
    * splits into `m` subspaces, each sub-vector is replaced by the id
    * of its nearest per-subspace k-means centroid (codes: m bytes per
    * vector instead of dim floats), and a query scores a vector by
    * ASYMMETRIC DISTANCE (ADC): per-subspace distance TABLES to all
    * ksub centroids are computed once per query, and each candidate
    * costs m table lookups, never a dim-length dot product.
    *
    * Same exact-arithmetic discipline as [[kmeansMicro]], so codebook
    * TRAINING, encoding, and ADC ranking are all exact integer
    * arithmetic on the micro-unit grid — the DuckDB oracle reproduces
    * the whole pipeline (training rounds included, keyed by subspace)
    * bit-for-bit. All m codebooks train in ONE Lloyd loop keyed by
    * subspace: the per-(m, cid, pos) arithmetic is independent, so the
    * result equals m separate trainings, but each round is one Spark
    * job over m·n sub-rows instead of m sequential jobs (measured at
    * sf0.1: 10.1 s → 4.1 s). The seed hash ignores the subspace, so one
    * seed table serves all m — exactly the oracle's CTE shape.
    *
    * Scale shape: the codebook (m·ksub·dsub rows) and the per-query
    * distance tables (m·ksub rows per query) broadcast; candidates
    * stream through an (m, cid) equi-join — no n×m float scan.
    * Returns (qid, nid, dist, rank): squared-L2 ADC distance in
    * micro-units², rank ascending with nid tie-break. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 4, dsub: Int = 16, ksub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dsub >= 1 && ksub >= 2, "pqTopK needs m, dsub >= 1, ksub >= 2")
    // same m·dsub tiling contract as ivfPqTopK: the split is dsub-driven,
    // so a mismatched m would silently train a different code count
    val pqDim = corpus.select(size(col(vecCol)).as("d")).head(1).headOption
      .getOrElse(throw new IllegalArgumentException(
        "pqTopK: empty corpus — nothing to train codebooks on")).getInt(0)
    require(pqDim == m * dsub,
      s"pqTopK: vector dim $pqDim != m*dsub = ${m * dsub} — set m/dsub to tile the vector exactly")
    def subRows(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        posexplode(transform(col(vecCol),
          v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType)))
          .as(Seq("gpos", "xq")))
        .select(col(outId), floor(col("gpos") / lit(dsub)).cast(IntegerType).as("m"),
          pmod(col("gpos"), lit(dsub)).as("pos"), col("xq"))
    // one exploded (id, m, pos, xq) table serves training AND encoding;
    // checkpointed so neither re-reads the source
    val x = subRows(corpus, "id").localCheckpoint()
    val seedIds = seedSlots(corpus, idCol, ksub)
    var cent = x.join(broadcast(seedIds), "id")
      .select(col("m"), col("cid"), col("pos"), col("xq").as("cq"))
    var centOwn = false
    for (_ <- 0 until iters) {
      val assigned = x.join(broadcast(cent), Seq("m", "pos"))
        .groupBy("id", "m", "cid")
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
        .groupBy("id", "m")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      val sums = x.join(assigned, Seq("id", "m"))
        .groupBy("m", "cid", "pos")
        .agg(sum(col("xq")).as("s"), count(lit(1)).as("n"))
      val prev = cent
      val prevOwn = centOwn
      cent = cent.as("o").join(sums.as("u"), Seq("m", "cid", "pos"), "left_outer")
        .select(col("m"), col("cid"), col("pos"),
          coalesce(((col("u.s") - pmod(col("u.s"), col("u.n"))) / col("u.n"))
            .cast(LongType), col("o.cq")).as("cq"))
        .localCheckpoint()
      centOwn = true
      if (prevOwn) graft.reasoner.Reasoner.unpersistCheckpoint(prev)
    }
    val centroids = cent
    val codes = x.join(broadcast(centroids), Seq("m", "pos"))
      .groupBy("id", "m", "cid")
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
      .groupBy("id", "m")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      .withColumnRenamed("id", "nid")
    val dt = subRows(queries, "qid").join(broadcast(centroids), Seq("m", "pos"))
      .groupBy("qid", "m", "cid")
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
    val scored = codes.join(broadcast(dt), Seq("m", "cid"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid").agg(sum(col("d2")).as("dist"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dist", "rank")
  }

  /** Symmetric int8 quantization: per-vector scale = maxAbs/127 (1.0 for
    * an all-zero vector), q_i = floor(v_i/scale + 0.5) clamped to
    * [-127, 127]. The 100 TB story: 4× less candidate/state volume at
    * <1 % cosine error — and since COSINE of two quantized vectors is
    * intDot(qa,qb) / √(intDot(qa,qa)·intDot(qb,qb)), the scales cancel
    * and the whole score is EXACT integer arithmetic: no float
    * accumulation order to disagree on, so the DuckDB oracle reproduces
    * the ranking bit-for-bit. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), v => abs(v.cast(DoubleType))))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    df.select(col(idCol),
      transform(col(vecCol), v =>
        greatest(lit(-127L), least(lit(127L),
          floor(v.cast(DoubleType) / scale + 0.5).cast(LongType)))).as("qvec"),
      scale.as("qscale"))
  }

  private def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Brute-force top-k over int8-quantized vectors: integer dot products,
    * queries broadcast — the memory-bounded twin of [[bruteForceTopK]].
    * cos rounds to 6 like the float path; rank ties break on nid. */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol).as("nid"), col("qvec").as("nq"))
    val q = quantizeInt8(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("qvec").as("qq"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", round(
        intDot(col("qq"), col("nq")).cast(DoubleType) /
          sqrt((intDot(col("qq"), col("qq")) * intDot(col("nq"), col("nq")))
            .cast(DoubleType)), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cos", "rank")
  }

  /** IVF top-k: probe the `nProbe` closest clusters per query, brute-force
    * within them. Approximate — recall measured against bruteForceTopK in
    * the test suite. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      /** Materialize the trained centroids before the probe joins.
        * Re-measured r4 (tools.ScaleProbe): a wash at 1× and 8×
        * (warm 1.99 s vs 2.06 s at 2k vectors; 3.89 s vs 3.98 s at 16k)
        * — the tiny centroid table makes either form cheap. Off by
        * default to keep the operator lazy/composable; pass true when
        * the Lloyd chain deepens (iters > 2) or centroids are reused
        * across many probe batches (the driver entry does). */
      checkpointCentroids: Boolean = false): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val centroids0 = trainCentroids(corpus, nClusters, iters = 2, idCol, vecCol)
    val centroids = if (checkpointCentroids) centroids0.localCheckpoint() else centroids0
    val corpusAssign = assign(corpus, centroids, idCol, vecCol)
    val indexed = corpus.join(corpusAssign, idCol)
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("cid"))
    val qProbes = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
    val scored = indexed.join(broadcast(qProbes), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
  }

  /** Engine-portable IVF top-k — the oracle-checkable twin of [[ivfTopK]]
    * (which stays rows-only: its [[trainCentroids]] averages in floats and
    * seeds with xxhash64, both engine-specific). This variant makes every
    * stage cross-engine exact, the same move that turned MinHash-LSH from
    * rows-only into a hash-checked pipeline
    * ([[Dedup.minHashLshPairs]]'s portable-hash leg):
    *
    *  - coarse quantizer = [[kmeansMicro]] (md5-seeded slots, Lloyd rounds
    *    in exact integer micro-unit arithmetic — already reproduced CTE-
    *    for-CTE by the `similarity_kmeans` DuckDB oracle);
    *  - list assignment and probe selection rank by integer squared-L2 in
    *    micro-units (BIGINT sums, ties to the lowest cid) instead of float
    *    cosine — deterministic on both engines by construction;
    *  - in-list scoring is the same round-6 cosine every other similarity
    *    entry hash-checks (IEEE ops in identical order on both engines).
    *
    * Scale shape is identical to [[ivfTopK]]: centroids (k·dim rows) and
    * the probe table (queries × nProbe) broadcast; the corpus moves
    * through one (id, cid) assignment shuffle and one per-query top-k
    * window over probed lists only — never n×m. Returns
    * (qid, nid, cos, rank). */
  def ivfTopKPortable(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    // k·dim rows; checkpointed so the three consumers below (corpus
    // assignment, query probing) don't each re-run the Lloyd chain
    val cent = kmeansMicro(corpus, nClusters, iters = 2, idCol, vecCol)
      .select(col("cid"), col("pos"), col("cq")).localCheckpoint()
    def micro(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        posexplode(transform(col(vecCol),
          v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType)))
          .as(Seq("pos", "xq")))
    def nearest(df: DataFrame, outId: String): DataFrame =
      micro(df, outId).join(broadcast(cent), "pos")
        .groupBy(outId, "cid")
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
    val codes = nearest(corpus, "nid")
      .groupBy("nid")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    val probes = nearest(queries, "qid")
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("cid"))
    val indexed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .join(codes, "nid")
    val qSide = probes
      .join(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")), "qid")
    val scored = indexed.join(broadcast(qSide), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    // cent's checkpoint blocks (k·dim longs) stay resident until driver
    // GC — model-sized, the documented tradeoff kmeansMicro also makes
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
  }

  /** IVF-PQ top-k — the two scale reductions COMPOSED, which is the
    * billion-scale ANN recipe (Jégou, Douze & Schmid 2011 §IV: coarse
    * inverted lists + product-quantized RESIDUALS + asymmetric-distance
    * scoring). [[ivfTopKPortable]] prunes candidates but still reads
    * full vectors in probed lists; [[pqTopK]] compresses vectors to m
    * codes but scans every code. This operator does both: a query reads
    * only the probed cells' m-byte codes — at 100 TB that is the
    * difference between touching nProbe/nCells of the corpus as floats
    * and touching it as codes (×dim·4/m less I/O again).
    *
    * Every stage stays on the exact integer micro-unit grid
    * ([[kmeansMicro]]'s discipline), so coarse training, residual PQ
    * training (one Lloyd chain keyed by subspace, [[pqTopK]]'s move),
    * encoding, probing and ADC ranking are all bit-reproducible in
    * ANSI SQL — the DuckDB oracle replays the whole pipeline.
    *
    * Scale shape: coarse centroids (nCells·dim rows), PQ codebooks
    * (m·ksub·dsub rows) and the per-query distance tables
    * (|q|·nProbe·m·ksub rows) broadcast; the corpus moves through one
    * (id, cell) assignment shuffle and the code table streams through
    * a (cell, subspace, code) lookup join over probed cells only —
    * never an n×dim per-query scan. Returns (qid, nid, dist, rank):
    * squared-L2 ADC distance in micro-units², rank ascending with nid
    * tie-break. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 8, nProbe: Int = 3, m: Int = 4, dsub: Int = 16,
      ksub: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nCells >= 1 && nProbe >= 1 && m >= 1 && dsub >= 1 && ksub >= 2,
      "ivfPqTopK needs nCells, nProbe, m, dsub >= 1, ksub >= 2")
    // m is a CONTRACT, not just documentation: the subspace split is
    // driven by dsub, so a dim that isn't exactly m·dsub would silently
    // train a different code count than the caller asked for (and a
    // ragged final subspace) — fail loudly instead. One head() on a
    // 1-row projection.
    val dim = corpus.select(size(col(vecCol)).as("d")).head(1).headOption
      .getOrElse(throw new IllegalArgumentException(
        "ivfPqTopK: empty corpus — nothing to train the quantizers on")).getInt(0)
    require(dim == m * dsub,
      s"ivfPqTopK: vector dim $dim != m*dsub = ${m * dsub} — set m/dsub to tile the vector exactly")
    // coarse quantizer: integer Lloyd, 2 rounds (the oracle unrolls 2)
    val cent = kmeansMicro(corpus, nCells, iters = 2, idCol, vecCol)
      .select(col("cid").as("cell"), col("pos"), col("cq")).localCheckpoint()
    def micro(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        posexplode(transform(col(vecCol),
          v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType)))
          .as(Seq("pos", "xq")))
    // ONE exploded corpus table serves cell assignment AND the residual
    // build (pqTopK's pattern) — without it each consumer re-scans the
    // source and re-runs the explode projection
    val xc = micro(corpus, "id").localCheckpoint()
    def nearestCell(df: DataFrame, outId: String): DataFrame =
      micro(df, outId).join(broadcast(cent), "pos")
        .groupBy(outId, "cell")
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
    // corpus → cell (one shuffle; this IS the inverted-list structure)
    val cells = xc.join(broadcast(cent), "pos")
      .groupBy("id", "cell")
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
      .groupBy("id")
      .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"))
    // residual rows, split into m subspaces of dsub components each
    val xr = xc.join(cells, "id")
      .join(broadcast(cent), Seq("cell", "pos"))
      .select(col("id"), col("cell"),
        floor(col("pos") / lit(dsub)).cast(IntegerType).as("msub"),
        pmod(col("pos"), lit(dsub)).as("spos"),
        (col("xq") - col("cq")).as("rq"))
      .localCheckpoint()
    // residual PQ codebooks: ONE Lloyd chain keyed by subspace (result
    // equals m separate trainings — pqTopK's measured batching), seeds
    // shared with the coarse hash family
    val seedIds = seedSlots(corpus, idCol, ksub)
    var pc = xr.join(broadcast(seedIds), "id")
      .select(col("msub"), col("cid"), col("spos"), col("rq").as("cq"))
    var pcOwn = false
    for (_ <- 0 until 2) {
      val assigned = xr.join(broadcast(pc), Seq("msub", "spos"))
        .groupBy("id", "msub", "cid")
        .agg(sum((col("rq") - col("cq")) * (col("rq") - col("cq"))).as("d2"))
        .groupBy("id", "msub")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      val sums = xr.join(assigned, Seq("id", "msub"))
        .groupBy("msub", "cid", "spos")
        .agg(sum(col("rq")).as("s"), count(lit(1)).as("n"))
      val prev = pc
      val prevOwn = pcOwn
      pc = pc.as("o").join(sums.as("u"), Seq("msub", "cid", "spos"), "left_outer")
        .select(col("msub"), col("cid"), col("spos"),
          coalesce(((col("u.s") - pmod(col("u.s"), col("u.n"))) / col("u.n"))
            .cast(LongType), col("o.cq")).as("cq"))
        .localCheckpoint()
      pcOwn = true
      if (prevOwn) graft.reasoner.Reasoner.unpersistCheckpoint(prev)
    }
    // encode: m codes per vector (this is ALL a candidate costs at scan).
    // Checkpointed so the n·dim training tables (xc, xr) can be RELEASED
    // here instead of leaking cached blocks across bench reps — codes is
    // n·m rows (dim/m× smaller), the only corpus-sized block the result
    // retains
    val codes = xr.join(broadcast(pc), Seq("msub", "spos"))
      .groupBy("id", "cell", "msub", "cid")
      .agg(sum((col("rq") - col("cq")) * (col("rq") - col("cq"))).as("d2"))
      .groupBy("id", "cell", "msub")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("code"))
      .withColumnRenamed("id", "nid")
      .localCheckpoint()
    graft.reasoner.Reasoner.unpersistCheckpoint(xc)
    graft.reasoner.Reasoner.unpersistCheckpoint(xr)
    // query side: nProbe nearest cells, then one ADC distance table per
    // probed cell (the residual depends on the cell, Jégou §IV.A)
    val probes = nearestCell(queries, "qid")
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("cell"))
    val qr = micro(queries, "qid").join(broadcast(probes), "qid")
      .join(broadcast(cent), Seq("cell", "pos"))
      .select(col("qid"), col("cell"),
        floor(col("pos") / lit(dsub)).cast(IntegerType).as("msub"),
        pmod(col("pos"), lit(dsub)).as("spos"),
        (col("xq") - col("cq")).as("rq"))
    // dt is |q|·nProbe·m·ksub rows — broadcast-tiny; materializing it
    // lets the coarse centroids and PQ codebooks be released too, so the
    // returned frame retains only codes + dt (bounded), not the five
    // training checkpoints (the ADVICE r8 session-drag class)
    val dt = qr.join(broadcast(pc), Seq("msub", "spos"))
      .groupBy("qid", "cell", "msub", "cid")
      .agg(sum((col("rq") - col("cq")) * (col("rq") - col("cq"))).as("d2"))
      .localCheckpoint()
    graft.reasoner.Reasoner.unpersistCheckpoint(cent)
    if (pcOwn) graft.reasoner.Reasoner.unpersistCheckpoint(pc)
    // ADC: candidates in probed cells cost m table lookups each
    val scored = codes.join(broadcast(dt),
        codes("cell") === dt("cell") && codes("msub") === dt("msub") &&
          codes("code") === dt("cid"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid").agg(sum(col("d2")).as("dist"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dist", "rank")
  }
}
