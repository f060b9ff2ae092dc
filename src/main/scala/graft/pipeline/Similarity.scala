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
  /** Element-type contract (ADVICE r11): `array<long>` columns are
    * treated as ALREADY micro-quantized (no ×10⁶ floor) — the grid the
    * training loop itself emits; float/double/int arrays are quantized
    * per element. Callers holding raw (non-micro) long embeddings must
    * cast to double first. */
  def assignIntL2(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // centroids are model-sized by contract (k·dim rows) — collected into
    // a codegen constant so assignment is a zero-shuffle narrow pass
    // (was: explode + broadcast join + two aggregations per call). Same
    // micro-unit arithmetic, same (d2, cid) tie-break — bit-identical.
    val cmat = centroidMatrix(centroids)
    corpus.select(col(idCol), nearestCid(vecCol, cmat).as("cid"))
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
  /** The k seed VECTORS (cid → the min-id member's `vec` projection),
    * collected in ONE pass: the hash-slot/min-id seeding every portable
    * training chain uses (md5-portable — the oracle reproduces the
    * seeds), fused with the seed-vector fetch that used to be a second
    * action. k is model-sized by contract, so this is bounded driver
    * control state; collecting (instead of the old localCheckpoint +
    * count + join) makes seeding one job total and leaves no blocks to
    * leak across bench reps. A slot no id hashes into would silently
    * train FEWER than k centroids (ADVICE r6) — fail loudly instead. */
  private def seedVectors(corpus: DataFrame, idCol: String, k: Int,
      vec: Column): Array[(Int, Array[Long])] = {
    val slotted = corpus.select(
      pmod(Dedup.md5Hash60(concat(lit("kmeans-seed"), col(idCol).cast("string"))),
        lit(k.toLong)).cast(IntegerType).as("cid"),
      col(idCol).as("id"), vec.as("xq"))
    // r12: for integral ids (every current caller) the per-slot min-id
    // fold is one zero-shuffle ScanBridge job instead of groupBy →
    // Exchange → min_by → collect (2 AQE jobs). Same winner per slot —
    // the minimum is the minimum on any partitioning.
    val integralId = corpus.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val rows: Array[(Int, Array[Long])] = if (integralId) {
      val typed = slotted.select(col("cid"), col("id").cast(LongType), col("xq"))
      val slots = org.apache.spark.sql.graft.ScanBridge
        .aggregateRows[Array[(Long, Array[Long])]](typed,
          () => new Array[(Long, Array[Long])](k),
          { (acc, row) =>
              if (row.isNullAt(0)) throw new IllegalArgumentException(
                "k-means seeding: null id in the corpus")
              val cid = row.getInt(0)
              val id = row.getLong(1)
              if (acc(cid) == null || id < acc(cid)._1) {
                // a null vector still competes by id (the min_by
                // semantics); the non-null contract is enforced below
                val v = if (row.isNullAt(2)) null else {
                  val a = row.getArray(2)
                  var i = 0
                  while (i < a.numElements()) {
                    if (a.isNullAt(i)) throw new IllegalArgumentException(
                      "k-means seeding: seed vector has a null element")
                    i += 1
                  }
                  a.toLongArray()
                }
                acc(cid) = (id, v)
              }
              acc
          },
          { (a, b) =>
              var c = 0
              while (c < k) {
                if (a(c) == null || (b(c) != null && b(c)._1 < a(c)._1)) a(c) = b(c)
                c += 1
              }
              a
          })
      slots.zipWithIndex.collect { case (s, cid) if s != null => cid -> s._2 }
    } else {
      slotted
        .groupBy("cid")
        .agg(min_by(struct(col("id"), col("xq")), col("id")).as("s"))
        .select(col("cid"), col("s.xq"))
        .collect()
        .map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Long](1).toArray))
    }
    require(rows.length == k, s"k-means seeding filled ${rows.length} of $k slots — " +
      "nClusters/ksub too close to the corpus size for hash seeding")
    // a min-id seed row with a NULL vector would NPE downstream with no
    // hint at the cause (ADVICE r11) — name the contract instead
    rows.foreach { case (cid, v) => require(v != null,
      s"k-means seeding: slot $cid's min-id row has a null " +
        "embedding — seed vectors must be non-null") }
    rows
  }

  /** Micro-unit quantization column: floor(v·10⁶) as BIGINT per
    * component — the grid every portable-similarity stage computes on. */
  private[pipeline] def microCol(vecCol: String): Column =
    transform(col(vecCol), v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType))

  /** Collect a long-format (cid, pos, cq) centroid frame into a dense
    * matrix indexed [cid][pos] — model-sized by contract (k·dim rows). */
  private[pipeline] def centroidMatrix(centroids: DataFrame): Array[Array[Long]] = {
    val rows = centroids.select(col("cid").cast(IntegerType),
      col("pos").cast(IntegerType), col("cq")).collect()
    require(rows.nonEmpty, "centroidMatrix: empty centroid table")
    val k = rows.iterator.map(_.getInt(0)).max + 1
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    // dense-coverage contract (ADVICE r11): a gapped/sparse centroid
    // frame would silently zero-fill missing (cid, pos) cells and let a
    // phantom origin-vector centroid win the argmin — fail loudly
    require(rows.length == k * dim,
      s"centroidMatrix: ${rows.length} (cid, pos) rows for k=$k × dim=$dim — " +
        "the centroid table must cover every cell exactly once")
    val m = Array.ofDim[Long](k, dim)
    rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    m
  }

  /** Argmin cid against a centroid matrix, in-row: index of the first
    * minimum d2 — identical to the old `min_by(cid, struct(d2, cid))`
    * tie-break (lowest cid among equal distances). */
  private[pipeline] def nearestCid(vecCol: String, cents: Array[Array[Long]]): Column = {
    val d2s = graft.functions.CentroidDistances(col(vecCol), cents)
    (array_position(d2s, array_min(d2s)) - 1).cast(IntegerType)
  }

  def kmeansMicro(corpus: DataFrame, nClusters: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      /** Retained for source compatibility — the r11 kernel form has no
        * intermediate to materialize: centroids live as driver-local
        * model state (k·dim longs) between rounds, and each round is ONE
        * narrow corpus pass. */
      checkpoint: Boolean = true): DataFrame = {
    require(nClusters >= 1 && iters >= 1, "kmeansMicro needs k >= 1, iters >= 1")
    val spark = corpus.sparkSession
    val (cent, counts) = kmeansMicroMatrix(corpus, nClusters, iters, idCol, vecCol)
    val out: Seq[org.apache.spark.sql.Row] =
      for (c <- cent.indices; p <- cent(c).indices)
        yield org.apache.spark.sql.Row(c, p, cent(c)(p), counts(c))
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("pos", IntegerType, nullable = false),
        StructField("cq", LongType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  /** The r11 Lloyd loop: centroids as a DRIVER-LOCAL matrix (model-sized,
    * k·dim longs — the bounded control state every round's plan embeds
    * as a codegen constant via [[graft.functions.CentroidDistances]]).
    * Per round the corpus makes ONE narrow pass: in-row argmin against
    * the centroid constant (zero-shuffle assignment — guide §2.4), then
    * a (cid, pos) partial-aggregated sum/count whose k·dim result rows
    * are collected and merged on the driver with the SAME floor-division
    * mean, `(s − pmod(s, n)) / n` = `Math.floorDiv(s, n)` for n > 0 —
    * bit-identical to the old exploded-join formulation the DuckDB
    * oracles replay (pinned by PipelineSpec's partition-invariance and
    * blob-geometry tests).
    *
    * Replaces, per round: one corpus-sized explode shuffle through a
    * broadcast join + two aggregations, a k·dim localCheckpoint, and a
    * broadcast build job — measured (JobCountProbe, sf0.1):
    * similarity_kmeans 28 jobs → single-digit. At 100 TB the win is the
    * same shape: assignment is scan-parallel with no exchange, and only
    * k·dim aggregate rows ever reach the driver. */
  private[pipeline] def kmeansMicroMatrix(corpus: DataFrame, nClusters: Int,
      iters: Int, idCol: String, vecCol: String): (Array[Array[Long]], Array[Long]) = {
    // seeding + initial centroids fused into one collect (the k seed
    // vectors on the micro grid)
    var cent: Array[Array[Long]] = new Array(nClusters)
    seedVectors(corpus, idCol, nClusters, microCol(vecCol))
      .foreach { case (cid, v) => cent(cid) = v }
    var counts = new Array[Long](nClusters)
    val dim = cent(0).length
    for (_ <- 0 until iters) {
      // r12: the per-round (cid, pos) sum/count is MODEL-sized dense
      // state, so it folds in ONE zero-shuffle job (ScanBridge) instead
      // of posexplode → hash aggregate → Exchange → final aggregate →
      // collect (2-3 AQE jobs per round). The heavy per-row math — the
      // argmin and the micro quantization — still runs in whole-stage
      // codegen inside this projection; the fold only adds longs into a
      // per-task array. Exact BIGINT sums in either form: bit-identical
      // centroids on any partitioning (PipelineSpec pins this).
      val (sums, ns) = org.apache.spark.sql.graft.ScanBridge
        .aggregateRows[(Array[Array[Long]], Array[Long])](
          corpus.select(nearestCid(vecCol, cent).as("cid"),
            microCol(vecCol).as("xq")),
          () => (Array.ofDim[Long](nClusters, dim), new Array[Long](nClusters)),
          { case (acc @ (s, n), row) =>
              // null vec → null cid AND null xq: the old posexplode
              // emitted nothing for it — skip. A null cid with a
              // non-null vector (ragged dim) crashed the old collect
              // (NPE on getInt) — fail loudly instead.
              if (!row.isNullAt(1)) {
                if (row.isNullAt(0)) throw new IllegalStateException(
                  "kmeansMicro: vector has no nearest centroid (dimension " +
                    "mismatch with the seed vectors?)")
                val cid = row.getInt(0)
                val arr = row.getArray(1)
                val sc = s(cid)
                var i = 0
                while (i < dim) { sc(i) += arr.getLong(i); i += 1 }
                n(cid) += 1L
              }
              acc
          },
          { case ((s1, n1), (s2, n2)) =>
              var c = 0
              while (c < nClusters) {
                val a = s1(c); val b = s2(c)
                var i = 0
                while (i < dim) { a(i) += b(i); i += 1 }
                n1(c) += n2(c); c += 1
              }
              (s1, n1)
          })
      val next = cent.map(_.clone)
      counts = ns
      var c = 0
      while (c < nClusters) {
        if (ns(c) > 0L) {
          var i = 0
          while (i < dim) { next(c)(i) = Math.floorDiv(sums(c)(i), ns(c)); i += 1 }
        }
        c += 1
      }
      cent = next
    }
    (cent, counts)
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
    // r11 kernel form (same move as kmeansMicroMatrix): the m codebooks
    // are driver-local model state (m·ksub·dsub longs), per-subspace code
    // assignment is an IN-ROW argmin against them
    // ([[graft.functions.CentroidDistances]] on the subspace slice), and
    // each Lloyd round is ONE narrow corpus pass whose m·ksub·dsub
    // aggregate rows are collected and floor-div merged on the driver —
    // bit-identical arithmetic to the exploded-join form the DuckDB
    // oracle replays. Replaces, per round: a corpus-sized (id, m, pos)
    // explode shuffle through a broadcast join + two aggregations, a
    // codebook localCheckpoint and its broadcast build.
    val books = trainSubspaceBooks(corpus, m, dsub, ksub, iters, idCol, vecCol,
      residualOfCell = None)
    def codesArr(vec: Column): Column = array((0 until m).map { mi =>
      val d2s = graft.functions.CentroidDistances
        .slice(vec, books(mi), mi * dsub, dsub)
      (array_position(d2s, array_min(d2s)) - 1).cast(IntegerType)
    }: _*)
    val codes = corpus.select(col(idCol).as("nid"),
      posexplode(codesArr(col(vecCol))).as(Seq("m", "cid")))
    // per-query ADC distance tables: all ksub distances per subspace,
    // flattened (gp = m·ksub + cid) then re-split — queries are the
    // small side by construction
    val dtParts = (0 until m).map(mi => graft.functions.CentroidDistances
      .slice(col(vecCol), books(mi), mi * dsub, dsub))
    val dt = queries
      .select(col(idCol).as("qid"),
        posexplode(flatten(array(dtParts: _*))).as(Seq("gp", "d2")))
      .select(col("qid"),
        floor(col("gp") / lit(ksub)).cast(IntegerType).as("m"),
        pmod(col("gp"), lit(ksub)).cast(IntegerType).as("cid"), col("d2"))
    val scored = codes.join(broadcast(dt), Seq("m", "cid"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid").agg(sum(col("d2")).as("dist"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dist", "rank")
  }

  /** Train the m per-subspace codebooks (Lloyd on the micro grid, keyed
    * by subspace — one Spark pass per round for all m, the batching
    * [[pqTopK]] always used) and return them as a driver-local
    * [m][ksub][dsub] matrix. With `residualOfCell = Some((coarse, cellCol))`
    * the training vectors are RESIDUALS against the assigned coarse
    * centroid (the IVF-PQ form): rq_j = xq_j − coarse[cell]_j, computed
    * in-row. Seeds, tie-breaks and the floor-division mean are the same
    * md5/min-id/exact-integer construction as [[kmeansMicroMatrix]]. */
  private def trainSubspaceBooks(corpus: DataFrame, m: Int, dsub: Int,
      ksub: Int, iters: Int, idCol: String, vecCol: String,
      residualOfCell: Option[(Array[Array[Long]], Column)]): Array[Array[Array[Long]]] = {
    val trainVec: Column = residualOfCell match {
      case Some((coarse, cellCol)) =>
        val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
        zip_with(microCol(vecCol), element_at(coarseLit, cellCol + 1),
          (x, c) => x - c)
      case None => microCol(vecCol)
    }
    var books: Array[Array[Array[Long]]] = Array.ofDim[Array[Long]](m, ksub)
    seedVectors(corpus, idCol, ksub, trainVec).foreach { case (cid, v) =>
      // the m·dsub tiling contract, checked on the seed vectors (one
      // collect carries seeding, init AND the dim guard — no head() job)
      require(v.length == m * dsub,
        s"PQ codebooks: vector dim ${v.length} != m*dsub = ${m * dsub} — " +
          "set m/dsub to tile the vector exactly")
      for (mi <- 0 until m)
        books(mi)(cid) = java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub)
    }
    for (_ <- 0 until iters) {
      val codesArr = array((0 until m).map { mi =>
        val d2s = graft.functions.CentroidDistances
          .slice(trainVec, books(mi), mi * dsub, dsub)
        (array_position(d2s, array_min(d2s)) - 1).cast(IntegerType)
      }: _*)
      // r12: one zero-shuffle job per round (same move as
      // kmeansMicroMatrix — the (m, cid, pos) sums are model-sized dense
      // state; codes and residuals still computed in codegen upstream).
      // Exact integer sums → bit-identical codebooks.
      val (sums, ns) = org.apache.spark.sql.graft.ScanBridge
        .aggregateRows[(Array[Array[Array[Long]]], Array[Array[Long]])](
          corpus.select(codesArr.as("codes"), trainVec.as("xq")),
          () => (Array.ofDim[Long](m, ksub, dsub), Array.ofDim[Long](m, ksub)),
          { case (acc @ (s, n), row) =>
              // null residual/vector → the old posexplode emitted nothing
              // for the row — skip (its codes are null too). A null code
              // with a non-null vector crashed the old collect — fail
              // loudly instead.
              if (!row.isNullAt(1)) {
                val codes = row.getArray(0)
                val arr = row.getArray(1)
                var mi = 0
                while (mi < m) {
                  if (codes.isNullAt(mi)) throw new IllegalStateException(
                    "PQ codebooks: sub-vector has no nearest centroid " +
                      "(dimension mismatch with the seed vectors?)")
                  val cid = codes.getInt(mi)
                  val sc = s(mi)(cid)
                  var p = 0
                  while (p < dsub) { sc(p) += arr.getLong(mi * dsub + p); p += 1 }
                  n(mi)(cid) += 1L
                  mi += 1
                }
              }
              acc
          },
          { case ((s1, n1), (s2, n2)) =>
              var mi = 0
              while (mi < m) {
                var c = 0
                while (c < ksub) {
                  val a = s1(mi)(c); val b = s2(mi)(c)
                  var p = 0
                  while (p < dsub) { a(p) += b(p); p += 1 }
                  n1(mi)(c) += n2(mi)(c); c += 1
                }
                mi += 1
              }
              (s1, n1)
          })
      val next = books.map(_.map(_.clone))
      var mi = 0
      while (mi < m) {
        var c = 0
        while (c < ksub) {
          if (ns(mi)(c) > 0L) {
            var p = 0
            while (p < dsub) {
              next(mi)(c)(p) = Math.floorDiv(sums(mi)(c)(p), ns(mi)(c)); p += 1
            }
          }
          c += 1
        }
        mi += 1
      }
      books = next
    }
    books
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
    // r11 kernel form: the trained centroids are a driver-local matrix,
    // so list assignment is an IN-ROW argmin fused into the corpus scan
    // (no explode shuffle, no codes join — guide §2.4), and query
    // probing is a posexplode of the per-query d2 array (queries are the
    // small side by construction). Distances, tie-breaks and the in-list
    // round-6 cosine are bit-identical to the exploded-join form the
    // DuckDB oracle replays (recall + partition-invariance pinned by
    // PipelineSpec).
    val cmat = kmeansMicroMatrix(corpus, nClusters, iters = 2, idCol, vecCol)._1
    val d2s = graft.functions.CentroidDistances(col(vecCol), cmat)
    val indexed = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      nearestCid(vecCol, cmat).as("cid"))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        posexplode(d2s).as(Seq("cid", "d2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qv"), col("cid").cast(IntegerType).as("cid"))
    val scored = indexed.join(broadcast(probes), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
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
    // ragged final subspace) — fail loudly instead. r11: checked against
    // the seed vectors inside trainSubspaceBooks (no separate head() job).
    // r11 kernel form: coarse centroids AND residual codebooks live as
    // driver-local model state, so cell assignment, residual
    // computation and per-subspace encoding are ALL in-row expressions
    // fused into the corpus scan — no exploded corpus table, no
    // checkpoint chain, no codes join (guide §2.4/§4). Every number is
    // the same exact micro-unit arithmetic the DuckDB oracle replays
    // CTE-for-CTE.
    // coarse quantizer: integer Lloyd, 2 rounds (the oracle unrolls 2)
    val cmat = kmeansMicroMatrix(corpus, nCells, iters = 2, idCol, vecCol)._1
    val coarseLit = typedLit(cmat.map(_.toSeq).toSeq)
    val cellCol = nearestCid(vecCol, cmat)
    // residual PQ codebooks: ONE Lloyd chain keyed by subspace (result
    // equals m separate trainings — pqTopK's batching), seeds shared
    // with the coarse hash family; training vectors are the residuals
    // against the assigned cell
    val books = trainSubspaceBooks(corpus, m, dsub, ksub, iters = 2,
      idCol, vecCol, residualOfCell = Some((cmat, cellCol)))
    def rqOf(cell: Column): Column =
      zip_with(microCol(vecCol), element_at(coarseLit, cell + 1), (x, c) => x - c)
    def codesArr(rq: Column): Column = array((0 until m).map { mi =>
      val d2s = graft.functions.CentroidDistances
        .slice(rq, books(mi), mi * dsub, dsub)
      (array_position(d2s, array_min(d2s)) - 1).cast(IntegerType)
    }: _*)
    // encode: m codes per vector, computed in the scan projection
    val codes = corpus.select(col(idCol).as("nid"), cellCol.as("cell"),
      posexplode(codesArr(rqOf(cellCol))).as(Seq("msub", "code")))
    // query side: nProbe nearest cells, then one ADC distance table per
    // probed cell (the residual depends on the cell, Jégou §IV.A)
    val coarseD2s = graft.functions.CentroidDistances(col(vecCol), cmat)
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        posexplode(coarseD2s).as(Seq("cell", "d2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qv"), col("cell"))
    // dt is |q|·nProbe·m·ksub rows — broadcast-tiny; the probed cell's
    // residual and all ksub subspace distances are in-row expressions
    val qrCell = zip_with(
      transform(col("qv"), v => floor(v.cast(DoubleType) * lit(1000000.0)).cast(LongType)),
      element_at(coarseLit, col("cell") + 1), (x, c) => x - c)
    val dtParts = (0 until m).map(mi => graft.functions.CentroidDistances
      .slice(qrCell, books(mi), mi * dsub, dsub))
    val dt = probes
      .select(col("qid"), col("cell"),
        posexplode(flatten(array(dtParts: _*))).as(Seq("gp", "d2")))
      .select(col("qid"), col("cell"),
        floor(col("gp") / lit(ksub)).cast(IntegerType).as("msub"),
        pmod(col("gp"), lit(ksub)).cast(IntegerType).as("cid"), col("d2"))
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
