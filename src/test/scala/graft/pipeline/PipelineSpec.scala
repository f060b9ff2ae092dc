package graft.pipeline

import graft.SparkSpec
import graft.model.{QuadStore, QueryBuilder}
import org.apache.spark.sql.functions._

/** Pipeline + builder + multimodal semantics not covered by the DuckDB
  * oracle: LSH candidate quality, IVF recall, SimHash properties,
  * multimodal plumbing, fluent QueryBuilder. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf() + "/documents.parquet")
  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")

  test("minhash-lsh candidate pairs are a superset of high-jaccard exact pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, k = 3, numHashes = 32, bands = 8,
      threshold = 0.5).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // banding (8 bands × 4 rows) catches j≥0.8 pairs with prob ~1-(1-0.8^4)^8 ≈ 0.99
    val missed = exact -- lsh
    assert(missed.size <= math.max(1, exact.size / 10),
      s"LSH missed ${missed.size} of ${exact.size} high-sim pairs")
  }

  test("passjoin edit-distance pairs equal brute force, incl. short-string leg") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps runnin"), // 1 edit
      (3L, "the quick brown fox Jumps over the lazy dog and keeps sunning"), // 3 edits
      (4L, "a completely different document about spark physical plans"),
      (5L, "the quick brown fox leaps over the lazy dog and keeps jogging"), // > 4 edits
      (6L, "ab"), (7L, "abc"), (8L, "zz"), (9L, ""), (10L, "ab"), // short leg (< d+1 chars)
      (11L, "the quick brown fox jumps over the lazy dog and keeps running")) // ed 0 vs 1
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, maxDist = 4)
      .as[(Long, Long, Long)].collect().toSet
    val brute = df.select($"doc_id".as("ia"), $"text".as("ta"))
      .crossJoin(df.select($"doc_id".as("ib"), $"text".as("tb")))
      .filter($"ia" < $"ib")
      .withColumn("ed", levenshtein($"ta", $"tb"))
      .filter($"ed" <= 4)
      .select($"ia", $"ib", $"ed".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    // the fixture really exercises both legs: an ed-0 pair, the 1- and
    // 3-edit long pairs, and short-leg pairs (incl. the empty string)
    assert(brute.contains((1L, 11L, 0L)) && brute.contains((1L, 2L, 1L)))
    assert(brute.contains((6L, 9L, 2L)) && brute.contains((6L, 10L, 0L)))
    assert(!brute.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("edit-distance join preserves non-numeric ids (ADVICE r7)") {
    // the earlier cast-to-long nulled string ids, so every candidate join
    // missed and the operator silently returned empty
    val df = Seq(
      ("doc-a", "the quick brown fox jumps over the lazy dog and keeps running"),
      ("doc-b", "the quick brown fox jumps over the lazy dog and keeps runnin"),
      ("doc-c", "a completely different document about spark physical plans"),
      ("doc-d", "xy"), ("doc-e", "xz")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, maxDist = 4)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("doc-a", "doc-b", 1L), ("doc-d", "doc-e", 1L)))
  }

  test("edit-distance degenerate corpus: exactDedup-first keeps the join linear") {
    // a flood of byte-identical docs makes every (length, segment) key's
    // posting list O(N) and the candidate join quadratic — the SAME
    // degenerate case as the other candidate joins, with the SAME
    // documented answer: byte-dups belong to exactDedup, run it first.
    // This pins the policy: survivors of exactDedup (one per byte-class)
    // produce the correct pair set with singleton posting lists.
    val flood = (1L to 200L).map(i => (i, "an identical flooded document body"))
    val distinctTail = Seq((900L, "a genuinely different trailing document"),
      (901L, "a genuinely different trailing documents")) // 1 edit apart
    val df = (flood ++ distinctTail).toDF("doc_id", "text")
    val survivors = df.join(Dedup.exactDedup(df).select("doc_id"), "doc_id")
    val pairs = Dedup.editDistancePairs(survivors, maxDist = 4)
      .as[(Long, Long, Long)].collect().toSet
    // the flood collapsed to one representative: no flood-internal pairs
    // survive, only the genuine 1-edit pair
    assert(pairs == Set((900L, 901L, 1L)))
  }

  test("semDedupLshPairs equals within-cell brute force; b sized from n") {
    val got = Dedup.semDedupLshPairs(emb, threshold = 0.35, targetOccupancy = 100)
      .as[(Long, Long, Long, Double)].collect().toSet
    // independent rebuild: same plane family via lshBuckets single-band,
    // then a crossJoin brute force restricted to same-cell pairs
    val n = emb.count()
    val cells = math.max(1L, (n + 99) / 100)
    val b = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, cells - 1)))
    assert((1L << b) >= cells && (b == 1 || (1L << (b - 1)) < cells),
      s"b=$b is not the smallest with 2^b >= $cells")
    val cellOf = Similarity.lshBuckets(emb, nPlanes = b, bands = 1)
      .select(col("id"), col("bval").as("cell"))
    val e = emb.join(cellOf, col("vec_id") === col("id"))
      .select($"vec_id", $"embedding", $"cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
    def cos(a: Seq[Float], bb: Seq[Float]): Double = {
      val (ab, aa, b2) = a.indices.foldLeft((0.0, 0.0, 0.0)) { case ((x, y, z), i) =>
        (x + a(i).toDouble * bb(i), y + a(i).toDouble * a(i), z + bb(i).toDouble * bb(i))
      }
      ab / math.sqrt(aa * b2)
    }
    val want = (for {
      x <- e; y <- e
      if x._3 == y._3 && x._1 < y._1
      c = cos(x._2, y._2)
      if math.floor(c * 1e6 + 0.5) / 1e6 >= 0.35
    } yield (x._3, x._1, y._1, math.floor(c * 1e6 + 0.5) / 1e6)).toSet
    assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)))
    assert(got.nonEmpty, "fixture should contain same-cell near-dups")
  }

  test("semDedupPairs equals within-cluster brute force; cells bound candidates") {
    val got = Dedup.semDedupPairs(emb, threshold = 0.35, nClusters = 8, iters = 2)
      .as[(Int, Long, Long, Double)].collect().toSet
    // independent rebuild: final-centroid assignment, then a crossJoin
    // brute force restricted to same-cell pairs
    val cents = Similarity.kmeansMicro(emb, nClusters = 8, iters = 2)
    val asg = Similarity.assignIntL2(emb, cents)
    val e = emb.join(asg, "vec_id")
      .select($"vec_id", $"embedding", $"cid")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (ab, aa, bb) = a.indices.foldLeft((0.0, 0.0, 0.0)) { case ((x, y, z), i) =>
        (x + a(i).toDouble * b(i), y + a(i).toDouble * a(i), z + b(i).toDouble * b(i))
      }
      ab / math.sqrt(aa * bb)
    }
    val want = (for {
      (ia, va, ca) <- e; (ib, vb, cb) <- e
      if ia < ib && ca == cb
      c = math.rint(cos(va, vb) * 1e6) / 1e6 if c >= 0.35
    } yield (ca, ia, ib, c)).toSet
    assert(got == want)
    assert(got.nonEmpty, "threshold/cluster combination is vacuous on this corpus")
    // the blocking is real: some high-cosine pair straddles two cells
    // (SemDedup is cluster-local by definition — pin that boundary)
    val cellOf = e.map(t => t._1 -> t._3).toMap
    val crossCell = (for {
      (ia, va, _) <- e; (ib, vb, _) <- e
      if ia < ib && cellOf(ia) != cellOf(ib) && cos(va, vb) >= 0.35
    } yield (ia, ib))
    assert(crossCell.nonEmpty, "no cross-cell pair — the locality pin is vacuous")
    assert(crossCell.forall { case (ia, ib) =>
      !got.exists(p => p._2 == ia && p._3 == ib) })
  }

  test("simhash of identical docs is identical; hamming to near-dup small") {
    val base = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark engines and queries"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simHashSignatures(base).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
  }

  test("simhash blocking finds every pair within maxHamming (vs brute-force scan)") {
    // pigeonhole completeness at radius 6 — round 1 blocked on 4 segments,
    // which silently missed pairs at hamming 4-6
    val sigs = Dedup.simHashSignatures(docs)
    val brute = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .withColumn("hamming", Dedup.hamming(col("a.simhash"), col("b.simhash")))
      .filter(col("hamming") <= 6)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simHashPairs(docs, maxHamming = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missed ${(brute -- blocked).size}, spurious ${(blocked -- brute).size}")
  }

  test("codegen cosine expression is bitwise-equal to the HOF formulation") {
    graft.functions.CosineSimilarity.register(spark)
    val pairs = emb.as("a").crossJoin(emb.limit(5).as("b"))
      .select(
        Dedup.cosine(col("a.embedding"), col("b.embedding")).as("hof"),
        graft.functions.CosineSimilarity(col("a.embedding"), col("b.embedding")).as("native"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // mixed float/double arrays (centroid case) and degenerate inputs
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(2.0, 4.0))).toDF("f", "d")
    val mixed = df.select(graft.functions.CosineSimilarity(col("f"), col("d"))).collect().head
    assert(math.abs(mixed.getDouble(0) - 1.0) < 1e-12)
    val bad = Seq((Seq(1.0f), Seq(1.0, 2.0))).toDF("f", "d")
    assert(bad.select(graft.functions.CosineSimilarity(col("f"), col("d")))
      .collect().head.isNullAt(0))
  }

  test("ivf recall@5 vs brute force is reasonable") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 5, nClusters = 8, nProbe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.6, s"recall $recall")
  }

  test("ivfTopKPortable: recall floor and exact partition invariance") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopKPortable(emb, queries, k = 5,
        nClusters = 8, nProbe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.6, s"portable IVF recall $recall")
    // integer training + integer probe ranking → bit-identical output
    // regardless of physical layout (the property the oracle leans on)
    val a = Similarity.ivfTopKPortable(emb.repartition(1), queries, k = 5,
        nClusters = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = Similarity.ivfTopKPortable(emb.repartition(16), queries, k = 5,
        nClusters = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b)
  }

  test("pqTopK: reasonable recall vs brute force, exact partition invariance") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, k = 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    // 4 subspaces × 16 codes on 64 dims is a coarse quantizer; the point
    // here is a sanity floor, the exactness guarantee is the oracle's
    assert(recall > 0.2, s"PQ recall $recall")
    // exact integer arithmetic → identical output under repartitioning
    val a = Similarity.pqTopK(emb.repartition(1), queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val b = Similarity.pqTopK(emb.repartition(16), queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(a == b)
  }

  test("ivfPqTopK: candidate containment, recall floor, partition invariance") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 5, nCells = 8, nProbe = 4)
    val got = ivfpq.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // containment: every IVF-PQ result must come from a PROBED cell.
    // ivfTopKPortable shares the same coarse quantizer (kmeansMicro,
    // identical seeds) and the same integer-L2 probe ranking, so with
    // k = |corpus| its result set IS the full candidate set of the
    // probed cells — IVF-PQ pairs must be a subset.
    val candidates = Similarity.ivfTopKPortable(emb, queries,
        k = emb.count().toInt, nClusters = 8, nProbe = 4)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(candidates),
      s"IVF-PQ returned pairs outside probed cells: ${(got diff candidates).take(5)}")
    val recall = (exact intersect got).size.toDouble / exact.size
    // coarse 8-cell probe + 4×16 residual codes: sanity floor only — the
    // exactness guarantee is the driver oracle's bit-replay
    assert(recall > 0.2, s"IVF-PQ recall $recall")
    // exact integer arithmetic end-to-end → layout-invariant output
    val a = Similarity.ivfPqTopK(emb.repartition(1), queries, k = 5,
        nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val b = Similarity.ivfPqTopK(emb.repartition(16), queries, k = 5,
        nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(a == b)
  }

  test("kmeansMicro: exactness (partition invariance), descent, blob geometry") {
    // exact arithmetic → identical output for any physical partitioning
    val a = Similarity.kmeansMicro(emb.repartition(1), nClusters = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val b = Similarity.kmeansMicro(emb.repartition(16), nClusters = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    // cluster sizes account for every vector; at most k clusters
    val n = emb.count()
    assert(a.filter(_._2 == 0).toSeq.map(_._4).sum == n)
    assert(a.map(_._1).size <= 4)

    // Lloyd descent: reassign-WCSS against the output centroids must not
    // grow with more rounds (floor-mean is within 1 micro-unit per
    // component of the true minimizer, so allow 1% slack)
    def wcss(iters: Int): Double = {
      val cent = Similarity.kmeansMicro(emb, nClusters = 4, iters = iters)
        .collect().groupBy(_.getInt(0))
        .map { case (cid, rs) =>
          cid -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
      val xs = emb.select("embedding").collect()
        .map(_.getSeq[Float](0).map(v => math.floor(v * 1000000.0).toLong))
      xs.map { x =>
        cent.values.map(c => c.zip(x).map { case (ci, xi) =>
          val d = (xi - ci).toDouble; d * d }.sum).min
      }.sum
    }
    val (j1, j2) = (wcss(1), wcss(2))
    assert(j2 <= j1 * 1.01, s"WCSS grew: $j1 -> $j2")

    // two well-separated synthetic blobs: every non-empty centroid must
    // land inside one blob's value range, never between them
    val blobs = ((0 until 20).map(i => (i.toLong, Seq.fill(4)(0.1f + 0.001f * i))) ++
      (0 until 20).map(i => (100L + i, Seq.fill(4)(5.0f + 0.001f * i))))
      .toDF("vec_id", "embedding")
    val cs = Similarity.kmeansMicro(blobs, nClusters = 4, iters = 3)
      .filter(col("n") > 0).collect().map(_.getLong(2))
    assert(cs.nonEmpty)
    cs.foreach(c => assert(c < 200000L || c > 4800000L,
      s"centroid component $c sits between the blobs"))

    // hash seeding with k near the corpus size can leave a slot empty —
    // must fail loudly, not silently train fewer centroids (ADVICE r6):
    // 3 ids into 64 slots always misses some
    val tiny = (0 until 3).map(i => (i.toLong, Seq.fill(4)(0.1f * i)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.kmeansMicro(tiny, nClusters = 64, iters = 1).collect())
    assert(e.getMessage.contains("of 64 slots"))
  }

  test("multimodal: payload round-trip, stub decode shape, frame sampling") {
    val media = Multimodal.fromText(docs.limit(50), "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val dec = Multimodal.decodeFeatures(media)
    val row = dec.filter(col("media_id") === 0).collect().head
    assert(row.getAs[Int]("channels") == 3)
    assert(row.getSeq[Float](row.fieldIndex("features")).size == 8)
    val sized = Multimodal.planResize(dec, 32)
    assert(sized.filter(col("target_width") > 32 || col("target_height") > 32).count() == 0)
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    val f0 = frames.filter(col("media_id") === 0).collect()
    // dense 0,1,2,… frame numbering over the kept (every-stride-th) chunks
    assert(f0.nonEmpty &&
      f0.map(_.getInt(1)).sorted.toSeq == f0.indices.toSeq)
    intercept[IllegalArgumentException](
      Multimodal.sampleFrames(media, frameBytes = 16, stride = 0))
  }

  test("dHash: perceptual near-dup on real PNGs, re-encode stable") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // horizontal gradient, the same gradient with a dark patch, and a
    // vertical gradient (orthogonal structure)
    val base = png(64, 48)((x, _) => x * 3)
    val patched = png(64, 48)((x, y) => if (x >= 40 && x < 48 && y < 12) 0 else x * 3)
    val vert = png(64, 48)((_, y) => y * 4)
    val media = Seq((0L, base), (1L, patched), (2L, vert))
      .toDF("media_id", "payload")
    val hashes = Multimodal.imageDHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a pure horizontal gradient sets every gradient bit; a vertical one none
    assert(hashes(0L) == -1L)
    assert(hashes(2L) == 0L)
    val pairs = Multimodal.dHashPairs(media, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
    // perceptual stability: a lossy JPEG re-encode of the SAME pixels
    // keeps the gradient fingerprint (byte digests would diverge)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(Multimodal.dHashBits(bos.toByteArray) == Multimodal.dHashBits(base))
  }

  test("hammingPairs64 blocking is recall-complete vs brute force") {
    // random 64-bit signatures + twins within the radius: the pigeonhole
    // blocked join must reproduce the unfiltered all-pairs ground truth
    val rnd = new scala.util.Random(1234)
    val bases = (0 until 48).map(i => (i.toLong * 2, rnd.nextLong()))
    val twins = bases.map { case (id, sig) =>
      val flips = rnd.nextInt(4) // 0..3 bit flips, inside maxHamming = 3
      val t = (0 until flips).foldLeft(sig)((s, _) => s ^ (1L << rnd.nextInt(64)))
      (id + 1, t)
    }
    val sigs = (bases ++ twins).toDF("id", "sig")
    val got = Dedup.hammingPairs64(sigs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = (bases ++ twins)
    val want = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want)
  }

  test("multimodal: REAL image decode via JDK ImageIO in mapPartitions") {
    // 20×10 PNG, left half black, right half white → luminance histogram
    // mass 0.5 in bin 0 and 0.5 in bin 7
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = spark.createDataFrame(Seq((7L, baos.toByteArray, "image/png")))
      .toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        org.apache.spark.sql.functions.struct(col("mime"),
          org.apache.spark.sql.functions.length(col("payload")).cast("long").as("n_bytes"),
          org.apache.spark.sql.functions.lit("test").as("source")).as("meta"))
    val dec = Multimodal.decodeFeatures(media, Multimodal.imageDecode).collect().head
    assert(dec.getAs[Int]("width") == 20)
    assert(dec.getAs[Int]("height") == 10)
    assert(dec.getAs[Int]("channels") == 3)
    val feats = dec.getSeq[Float](dec.fieldIndex("features"))
    assert(math.abs(feats(0) - 0.5f) < 1e-6)
    assert(math.abs(feats(7) - 0.5f) < 1e-6)
    // unreadable bytes fall back to the stub instead of throwing
    val junk = spark.createDataFrame(Seq((8L, Array[Byte](1, 2, 3), "video/mp4")))
      .toDF("media_id", "payload", "mime")
      .select(col("media_id"), col("payload"),
        org.apache.spark.sql.functions.struct(col("mime"),
          org.apache.spark.sql.functions.lit(3L).as("n_bytes"),
          org.apache.spark.sql.functions.lit("test").as("source")).as("meta"))
    assert(Multimodal.decodeFeatures(junk, Multimodal.imageDecode).count() == 1)
  }

  test("multimodal: REAL image resize (Graphics2D) halves dims, passes junk through") {
    val img = new java.awt.image.BufferedImage(64, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64) img.setRGB(x, y, 0x336699)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = spark.createDataFrame(
        Seq((1L, baos.toByteArray), (2L, Array[Byte](9, 9, 9))))
      .toDF("media_id", "payload")
    val out = Multimodal.resizeImages(media, maxSide = 16).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // 64×32 → longest side 16 preserving aspect → 16×8, re-encoded PNG
    assert(out(1L).getAs[Boolean]("resized"))
    assert(out(1L).getAs[Int]("out_width") == 16 && out(1L).getAs[Int]("out_height") == 8)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).getAs[Array[Byte]]("payload")))
    assert(back.getWidth == 16 && back.getHeight == 8)
    assert((back.getRGB(8, 4) & 0xFFFFFF) == 0x336699) // solid color survives
    // junk passes through untouched
    assert(!out(2L).getAs[Boolean]("resized"))
    assert(out(2L).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](9, 9, 9))
    // small images never upscale
    val same = Multimodal.resizeImages(media.filter(col("media_id") === 1L),
      maxSide = 1000).collect().head
    assert(same.getAs[Int]("out_width") == 64 && same.getAs[Int]("out_height") == 32)
  }

  test("skew helpers: salted agg and salted join match unsalted results") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val direct = li.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), col("l_orderkey"),
        buckets = 8, partial = sum("l_quantity"), merge = sum, as = "q")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, v) => assert(math.abs(v - salted(k)) < 1e-6) }

    val orders = spark.read.parquet(sf() + "/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(orders, Seq("l_orderkey"), "inner").count()
    val saltedJ = Skew.saltedJoin(li, orders, Seq("l_orderkey"),
      col("l_partkey"), buckets = 4).count()
    assert(plain == saltedJ)
  }

  test("query builder streaming mode: window, R2S, report strategies (query_builder.rs:631-758)") {
    val st = QuadStore.fromTriples(spark, Nil)
    val sb = QueryBuilder(st).predicate("temp")
      .window(widthMs = 10, slideMs = 10)
      .withStreamOperator("RSTREAM")
      .asStream()
    assert(sb.isStreaming)
    // window (0,10] gets two temp readings and one (filtered-out) humidity
    sb.addStreamTriple("s1", "temp", "20", 2)
    sb.addStreamTriple("s2", "humidity", "80", 5)
    sb.addStreamTriple("s3", "temp", "21", 9)
    sb.addStreamTriple("s4", "temp", "30", 12) // closes window at 10
    val batches = sb.getStreamResults()
    assert(batches.size == 1)
    assert(batches.head.toSet == Set(("s1", "temp", "20"), ("s3", "temp", "21")))
    // next window (10,20]: ISTREAM-style diff via a fresh builder
    sb.addStreamTriple("s5", "temp", "31", 21) // closes window at 20
    val b2 = sb.getStreamResults()
    assert(b2.head.toSet == Set(("s4", "temp", "30")))
    assert(sb.getAllStreamResults.size == 2)
    sb.stopStream()
    assert(!sb.isStreaming)
    intercept[IllegalArgumentException](sb.addStreamTriple("x", "temp", "1", 30))

    // DSTREAM emits what left the window
    val ds = QueryBuilder(st).predicate("temp")
      .window(10, 10).withStreamOperator("DSTREAM").asStream()
    ds.addStreamTriple("a", "temp", "1", 2)
    ds.addStreamTriple("b", "temp", "2", 12)
    ds.getStreamResults()
    ds.addStreamTriple("c", "temp", "3", 22)
    val d2 = ds.getStreamResults()
    assert(d2.head.toSet == Set(("a", "temp", "1")))

    // NonEmptyContent suppresses empty windows
    val ne = QueryBuilder(st).predicate("nope")
      .window(10, 10).withReportStrategy(graft.streaming.RspEngine.NonEmptyContent)
      .asStream()
    ne.addStreamTriple("a", "temp", "1", 2)
    ne.addStreamTriple("b", "temp", "2", 12)
    assert(ne.getStreamResults().isEmpty)
  }

  test("query builder: filters, join, modifiers, terminals (query_builder.rs:151-758)") {
    val st = QuadStore.fromTriples(spark, Seq(
      ("alice", "knows", "bob"), ("bob", "knows", "carol"),
      ("alice", "age", "30"), ("bob", "age", "25")))
    val qb = QueryBuilder(st)
    assert(qb.predicate("knows").count() == 2)
    assert(qb.subject("alice").predicate("knows").getObjects == Seq("bob"))
    assert(qb.subjectStartsWith("al").count() == 2)
    assert(qb.objContains("3").getTriples == Seq(("alice", "age", "30")))
    // join: ?x knows ?y . ?y knows ?z
    val joined = qb.predicate("knows").join(qb.predicate("knows"), "o", "s")
    assert(joined.toDF.select("s", "o2").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("alice", "carol")))
    assert(qb.predicate("age").orderBy("o").getTriples.map(_._3) == Seq("25", "30"))
    assert(qb.predicate("age").orderBy("o").offset(1).limit(1).getTriples.map(_._3) == Seq("30"))
    assert(qb.where((s, p, o) => p === "age" && o.cast("double") > 27).count() == 1)
    assert(qb.groupByPosition("p").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("knows", 2L), ("age", 2L)))
  }

  test("hash sampling/splitting: deterministic, complete, key-stable") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val s1 = Sampling.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sampling must be a pure function of the key")
    assert(math.abs(s1.size - 200) < 60, s"~20% expected, got ${s1.size}")
    // widening the rate only ADDS documents (nested samples — the property
    // that lets a pipeline grow a sample without reshuffling past work)
    val s30 = Sampling.deterministicSample(docs, "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s30), "samples must nest as the rate grows")
    val split = Sampling.splitAssign(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.keySet == Set("train", "validation", "test"), s"got $split")
    assert(split.values.sum == 1000)
    assert(split("train") > split("validation") && split("train") > split("test"))
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // k=3, w=4: any two docs sharing >= 6 consecutive tokens must share
    // at least one selected fingerprint (the MOSS covering property);
    // distinct docs with no shared run share none here
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared nine ten eleven"),
      (3L, "totally different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
        TextAnalysis.winnowingFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, s"no shared fingerprint: $fps")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
    // short-document degenerate cases
    val short = Seq((4L, "a b"), (5L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.winnowingFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(short(4L).isEmpty)      // < k tokens -> empty set
    assert(short(5L).size == 1)    // 2 grams < w -> single global minimum
  }

  test("hyperplane-LSH ANN: near-duplicate vectors are recalled") {
    // hyperplane LSH's contract is HIGH-cosine recall: a perturbed copy
    // (cosine ≈ 0.999) agrees on ~99% of signature bits, so it collides
    // in some band essentially always. (The synthetic corpus's organic
    // neighbors sit at cosine ≈ 0.45 where 4-bit bands are ~50/50 by
    // design — that regime belongs to IVF, which trains on the data.)
    import org.apache.spark.sql.functions.{transform => atransform}
    val base = emb.filter(col("vec_id") < 10)
    val probes = base.select((col("vec_id") + 100000L).as("vec_id"),
      atransform(col("embedding"), (x, i) =>
        x + (pmod(xxhash64(col("vec_id"), i), lit(100)).cast("double") - 50.0) / 5000.0)
        .as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(probes)
    val lsh = Similarity.lshTopK(corpus, probes, k = 5, nPlanes = 16, bands = 4)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val hits = (0L until 10L).count(i => lsh.getOrElse(i + 100000L, Set.empty)(i))
    assert(hits >= 9, s"near-dup recall $hits/10: $lsh")
  }

  test("contamination: shared-gram counting, self-pair exclusion, maxDf cap") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),      // shares 3-gram run with 10
      (1L, "alpha beta gamma zeta eta"),           // shares exactly one 3-gram with 10
      (2L, "hot hot hot hot hot hot"),             // only the hot gram
      (10L, "alpha beta gamma delta epsilon zeta") // the benchmark item
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 10L)
    val pairs = Contamination.contaminatedPairs(docs, bench, n = 3,
        minShared = 2, maxDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 0 shares "alpha beta gamma", "beta gamma delta", "gamma delta epsilon"
    assert(pairs == Set((0L, 10L, 3L)))
    // benchmark item never flags itself even though it trivially matches
    assert(!pairs.exists(p => p._1 == p._2))
    // a df cap of 1 kills every gram that appears in two documents
    val capped = Contamination.contaminatedPairs(docs, bench, n = 3,
      minShared = 1, maxDf = Some(1))
    assert(capped.count() == 0)
  }

  test("weighted sampling: per-group rates, zero weight, default; subset of unweighted") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "grp")
    val kept = Sampling.weightedSample(df, "id", "grp",
      Map("src0" -> 100, "src1" -> 0), defaultPercent = 50)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.getOrElse("src0", 0L) == 100L)      // 100% kept
    assert(!byGrp.contains("src1"))                   // zero weight
    val d = byGrp.getOrElse("src2", 0L)
    assert(d > 25 && d < 75, s"default 50% kept $d of 100")
    // determinism + monotone nesting: a lower rate keeps a subset
    val lower = Sampling.weightedSample(df, "id", "grp",
      Map("src0" -> 40), defaultPercent = 0).select("id").collect().map(_.getLong(0)).toSet
    val higher = Sampling.weightedSample(df, "id", "grp",
      Map("src0" -> 80), defaultPercent = 0).select("id").collect().map(_.getLong(0)).toSet
    assert(lower.subsetOf(higher) && lower.nonEmpty)
  }

  test("vocabulary ranking is deterministic; oov rate counts occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "b c d d")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // counts: a=3 b=3 c=2 d=2 — ties break token-ascending
    assert(v.toSeq == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
    val oov = TextAnalysis.oovRate(docs, TextAnalysis.vocabulary(docs, k = 3))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(oov(1L) == 0.0)           // all of doc 1 in vocab
    assert(oov(2L) == 0.5)           // d d out of b c d d
  }

  test("language model: exact smoothed nll, unseen-gram cost, gram-free docs") {
    import spark.implicits._
    // unigram model on "a a b": cnt(a)=2, cnt(b)=1, N=3, V=2
    val lm = LanguageModel.train(Seq((0L, "a a b")).toDF("doc_id", "text"))
    assert(lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 1L))
    val score = LanguageModel.scoreNll(
        Seq((0L, "a b"), (1L, "z")).toDF("doc_id", "text"), lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nv = 5.0 // N + V
    val expA = ((math.log(nv) - math.log(3.0)) + (math.log(nv) - math.log(2.0))) / 2
    assert(math.abs(score(0L) - expA) < 1e-12)
    // unseen gram costs ln(N+V) - ln(0+1)
    assert(math.abs(score(1L) - math.log(nv)) < 1e-12)
    // bigram: a doc below n tokens has no grams and scores 0 (kept)
    val lm2 = LanguageModel.train(Seq((0L, "a b a b")).toDF("doc_id", "text"), n = 2)
    val s2 = LanguageModel.scoreNll(
        Seq((0L, "a b"), (1L, "x")).toDF("doc_id", "text"), lm2, n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // lm2: cnt("a b")=2, cnt("b a")=1, N=3, V=2
    assert(math.abs(s2(0L) - (math.log(nv) - math.log(3.0))) < 1e-12)
    assert(s2(1L) == 0.0)
    // training docs always score at or below a disjoint-vocab outlier —
    // the CCNet filter property the stage exists for
    assert(score(0L) < score(1L))
  }

  test("trigram stupid backoff: all four levels fire with the right ratios") {
    import spark.implicits._
    // train "a b c a b c": c3("a b c")=2, c2("a b")=2,("b c")=2,("c a")=1,
    // c1(a)=c1(b)=c1(c)=2, N=6, V=3
    val train = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (0L, "a b c"), // trigram level: 2/2 = 1 -> nll 0
      (1L, "x b c"), // bigram level: 0.4 * c2("b c")/c1(b) = 0.4
      (2L, "b c c"), // unigram level: 0.16 * c1(c)/N
      (3L, "b c x"), // OOV level: 0.16 / (N + V)
      (4L, "a")      // no trigram -> (0, 0)
    ).toDF("doc_id", "text")
    val got = LanguageModel.trigramBackoffNll(score, train)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def micro(nll: Double): Long = math.floor(nll * 1000000.0).toLong
    val a2 = 0.4 * 0.4
    assert(got(0L) == ((1L, 0L)))
    assert(got(1L) == ((1L, micro(-math.log(0.4 * (2.0 / 2.0))))))
    assert(got(2L) == ((1L, micro(-math.log(a2 * (2.0 / 6.0))))))
    assert(got(3L) == ((1L, micro(-math.log(a2 / 9.0)))))
    assert(got(4L) == ((0L, 0L)))
    // damping orders the levels: deeper backoff always costs more here
    assert(got(0L)._2 < got(1L)._2 && got(1L)._2 < got(2L)._2 &&
      got(2L)._2 < got(3L)._2)
  }

  test("semantic dedup keeps the min-id representative per embedding group") {
    import spark.implicits._
    // a ≈ b (same direction), c orthogonal, d in another block entirely
    val e = Seq(
      (1L, Seq(1.0f, 0.0f), "x"), (2L, Seq(0.9f, 0.1f), "x"),
      (3L, Seq(0.0f, 1.0f), "x"), (4L, Seq(1.0f, 0.0f), "y"))
      .toDF("vec_id", "embedding", "label")
    val reps = Dedup.semanticRepresentatives(e, threshold = 0.9, blockCol = "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 survives for {1,2}; 3 and 4 are their own groups
    assert(reps == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("token shards: two-pass prefix sum equals the sequential assignment") {
    import spark.implicits._
    // many small docs across many partitions; budget 10 tokens
    val docs = (1L to 200L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(13)
    val got = Sampling.tokenShards(docs, budget = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // sequential reference
    var cum = 0L
    val want = (1L to 200L).map { i =>
      val n = i % 7 + 1
      val shard = cum / 10L
      cum += n
      (i, n, shard)
    }
    assert(got.toSeq == want)
    // shards are contiguous id ranges and every shard except the last
    // crosses its budget boundary exactly once
    val byShard = got.groupBy(_._3).view.mapValues(_.map(_._1)).toMap
    byShard.foreach { case (_, ids) =>
      assert(ids.max - ids.min + 1 == ids.length, "shard ids not contiguous")
    }
  }

  test("C4 cleaning: line rules then document gates (Raffel et al. §2.2)") {
    import spark.implicits._
    val docs = Seq(
      // 3 good lines + one short, one unterminated, one javascript line
      (1L, "First proper sentence with enough words here.\nshort one.\n" +
        "No terminal punctuation on this line of words\n" +
        "A javascript mention kills this long line.\n" +
        "Second proper sentence with enough words too!\n" +
        "Third proper sentence asks enough words, yes?"),
      // enough good lines but lorem ipsum anywhere drops the doc
      (2L, "Alpha beta gamma delta epsilon zeta eta.\nGood second line with many words here.\n" +
        "Good third line with many words here.\nlorem ipsum dolor sit amet friends."),
      // curly brace anywhere drops the doc
      (3L, "One good line with plenty of words.\nTwo good line with plenty of words.\n" +
        "Three good line with plenty of words.\nvar x = { a: 1 }"),
      // only 2 surviving lines < minLines
      (4L, "Only good line number one right here.\nOnly good line number two right here.\n" +
        "unterminated trailer")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == "First proper sentence with enough words here.\n" +
      "Second proper sentence with enough words too!\n" +
      "Third proper sentence asks enough words, yes?")
  }

  test("passage dedup: case-insensitive hot spans scrubbed, original case kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog UNIQUE1 One Two"),
      (2L, "the quick brown fox jumps over the lazy dog UNIQUE2"),
      (3L, "nothing   shared here at all")).toDF("doc_id", "text")
    // docs 1+2 share a 9-token run (case-insensitively) => both 8-grams of
    // the run are hot at minDocs=2, covering positions 1..9 in each
    val hot = PassageDedup.hotSpans(docs, k = 8, minDocs = 2)
      .collect().map(_.getString(0)).toSet
    assert(hot == Set("the quick brown fox jumps over the lazy",
      "quick brown fox jumps over the lazy dog"))
    val clean = PassageDedup.scrubbed(docs, k = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == "UNIQUE1 One Two") // original case survives
    assert(clean(2L) == "UNIQUE2")
    // untouched docs pass through with whitespace normalized
    assert(clean(3L) == "nothing shared here at all")
    // Lee et al. guarantee at this granularity: any verbatim repeat of
    // >= 2k-1 tokens contains a repeated k-gram, so NO pair of scrubbed
    // docs still shares a 15-token run
    val scrubToks = clean.values.map(_.split("\\s+").toSeq).toSeq
    for (a <- scrubToks; b <- scrubToks if a != b;
         i <- 0 to a.size - 15; j <- 0 to b.size - 15)
      assert(a.slice(i, i + 15) != b.slice(j, j + 15))
  }

  test("pii scrub: counts and typed redaction, fixed replacement order") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@ex-co.org then 555-1234 or 555-9999 from 192.168.0.1 done"),
      (2L, "nothing sensitive here")).toDF("id", "text")
    val countCols = TextAnalysis.piiCounts($"text").map { case (n, c) => c.as(n) }
    val r = df.select($"id" +: countCols :+
        TextAnalysis.piiScrub($"text").as("scrubbed"): _*)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 1 && r(1L).getInt(2) == 2 && r(1L).getInt(3) == 1)
    assert(r(1L).getString(4) ==
      "mail [EMAIL] then [PHONE] or [PHONE] from [IP] done")
    assert(r(2L).getInt(1) == 0 && r(2L).getString(4) == "nothing sensitive here")
  }

  test("int8 quantized ANN: near-exact ranks, integer-only scores") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" <= 5)
    val floatRows = graft.pipeline.Similarity.bruteForceTopK(df, queries, k = 200)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getInt(3))))
    val floatCos = floatRows.map { case (k, (c, _)) => k -> c }.toMap
    val floatTop = floatRows.collect { case ((q, n), (_, 1)) => q -> n }.toMap
    val int8 = graft.pipeline.Similarity.int8TopK(df, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // random 16-dim data has razor-thin rank-1 gaps, so assert QUALITY,
    // not identity: the int8 top-1's true cosine is within quantization
    // error of the float top-1's
    (1L to 5L).foreach { q =>
      val loss = floatCos((q, floatTop(q))) - floatCos((q, int8((q, 1))))
      assert(loss < 0.02, s"query $q top-1 quality loss $loss")
    }
    // quantized components live in [-127, 127]
    val q = graft.pipeline.Similarity.quantizeInt8(df)
    val bad = q.select(explode($"qvec").as("c")).filter(abs($"c") > 127).count()
    assert(bad == 0)
  }

  test("char-trigram langid classifies real language snippets") {
    import spark.implicits._
    val df = Seq(
      (1L, "the king and the queen were singing during the information session"),
      (2L, "der schneider und der schuler sind durch die schule gegangen und singen"),
      (3L, "les grandes questions des auteurs etaient que la chaleur avait disparu"),
      (4L, "los ganados cercados araban la nacion mientras el hacendado cantaba"),
      (5L, "zzz qqq xxx")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langIdNgram($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en", s"got $got")
    assert(got(2L) == "de", s"got $got")
    assert(got(3L) == "fr", s"got $got")
    assert(got(4L) == "es", s"got $got")
    assert(got(5L) == "und", s"got $got")
  }

  test("incremental dedup: bloom routes, anti join decides — exact result") {
    import spark.implicits._
    val corpus = Seq((1L, "the quick brown fox"), (2L, "hello world"),
      (3L, "spark native engine")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "Hello   World"),   // dup of 2 after normalization
      (11L, "completely new document"),
      (12L, "the quick brown fox"), // dup of 1
      (13L, "another unseen text")).toDF("doc_id", "text")
    val kept = Dedup.incrementalExactDedup(fresh, corpus, expectedItems = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L), s"got $kept")
    // a pathological fpp (tiny filter) still gives the exact answer —
    // false positives only reroute docs into the anti join
    val keptTiny = Dedup.incrementalExactDedup(fresh, corpus,
      expectedItems = 1L, fpp = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptTiny == Set(11L, 13L), s"got $keptTiny")
  }

  test("temperature mix: smallest source kept whole, larger sources downsampled to rate") {
    import spark.implicits._
    val docs = ((1 to 1000).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(docs, "doc_id", "source", alpha = 0.7)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100, s"smallest source must keep 100%: $kept")
    // big keeps ~(1000/100)^(-0.3) = 10^-0.3 ≈ 0.501 of its rows
    val expect = 1000 * math.pow(10.0, -0.3)
    assert(math.abs(kept("big") - expect) < 60, s"big kept ${kept("big")}, want ~$expect")
    // determinism: same call keeps the same documents
    val a = Sampling.temperatureMix(docs, "doc_id", "source", 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMix(docs, "doc_id", "source", 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // alpha = 1: proportional mixing keeps everything
    assert(Sampling.temperatureMix(docs, "doc_id", "source", 1.0).count() == 1100)
  }

  test("chunking: coverage, overlap, tail, and zero-overlap reconstruction") {
    import spark.implicits._
    val doc = (1 to 107).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")

    // overlap 10, size 50 → stride 40 → chunks at 0, 40, 80 (tail 27)
    val r = TextAnalysis.chunk(df, chunkTokens = 50, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getInt(3)))).toMap
    assert(r.keys.count(_._1 == 1L) == 3)
    assert(r((1L, 0))._2 == 50 && r((1L, 1))._2 == 50 && r((1L, 2))._2 == 27)
    // consecutive chunks share exactly the 10-token overlap
    val c0 = r((1L, 0))._1.split(" ")
    val c1 = r((1L, 1))._1.split(" ")
    assert(c0.takeRight(10).sameElements(c1.take(10)))
    assert(c0.head == "t1" && c1.head == "t41")
    // a doc shorter than one chunk is a single whole chunk
    assert(r((2L, 0)) == ("a b c", 3) && !r.contains((2L, 1)))

    // zero overlap: chunks partition the token sequence exactly
    val flat = TextAnalysis.chunk(df.filter($"doc_id" === 1L), 40, 0)
      .orderBy("chunk_ix").collect().map(_.getString(2)).mkString(" ")
    assert(flat == doc)
  }

  test("dsir: target-like docs outrank off-target; top-fraction rank is the global order") {
    import spark.implicits._
    val target = (1 to 20).map(i =>
      (100L + i, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),  // on-target
      (2L, "quick brown fox jumps over the lazy dog"),            // near
      (3L, "zebra xylophone quartz vortex jackdaw nymph waltz"),  // off
      (4L, "")                                                    // no grams
    ).toDF("doc_id", "text")
    val w = Dsir.logImportanceWeights(raw, target, n = 2, buckets = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w(1L)._2 > w(2L)._2 && w(2L)._2 > w(3L)._2,
      s"ordering broke: $w")
    assert(w(4L) == ((0L, 0.0)))
    // two-pass distributed rank == naive global sort
    val weights = Dsir.logImportanceWeights(raw, target, n = 2, buckets = 512)
    val top = Dsir.selectTopFraction(weights, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val naive = weights.collect()
      .sortBy(r => (-r.getDouble(2), r.getLong(0))).take(2).map(_.getLong(0)).toSet
    assert(top == naive && top == Set(1L, 2L))
    intercept[IllegalArgumentException](
      Dsir.logImportanceWeights(raw, target.limit(0), n = 2, buckets = 512))
  }

  test("gopher quality rules: each rule fails exactly its target document") {
    import spark.implicits._
    val good = ((1 to 30).map(i => s"alpha$i") ++
      Seq("the", "of", "and") ++ (1 to 30).map(i => s"beta$i")).mkString(" ")
    val df = Seq(
      (1L, good),                                        // passes everything
      (2L, "the of and tiny"),                           // too few words
      (3L, good + " " + (1 to 8).map(_ => "###").mkString(" ")), // symbol ratio
      (4L, (1 to 60).map(_ => "the supercalifragilisticexpialidocious of").mkString(" ")), // mean len > 10
      (5L, Seq(good, "- b one", "- b two", "- b three", "- b four", "- b five",
        "- b six", "- b seven", "- b eight", "- b nine").mkString("\n")), // 90% bullets
      (6L, good + "\nTrails off...\nAnd again..."),      // 2/3 lines ellipsis
      (7L, ((1 to 30).map(i => s"alpha$i") ++ Seq("the") ++
        (1 to 30).map(i => s"beta$i")).mkString(" ")),   // only 1 stopword
      (8L, (good.split(" ") ++ (1 to 260).map(_ => "42")).mkString(" ")) // alpha frac
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQuality(df)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(8), "good doc must pass")
    assert(!r(2L).getBoolean(8) && r(2L).getLong(1) == 4)
    assert(!r(3L).getBoolean(8) && r(3L).getDouble(3) > 0.1)
    assert(!r(4L).getBoolean(8) && r(4L).getDouble(2) > 10.0)
    assert(!r(5L).getBoolean(8) && r(5L).getDouble(4) == 0.9)
    assert(!r(6L).getBoolean(8) && r(6L).getDouble(5) > 0.3)
    assert(!r(7L).getBoolean(8) && r(7L).getInt(7) == 1)
    assert(!r(8L).getBoolean(8) && r(8L).getDouble(6) < 0.8)
  }

  test("sequence packing: spans partition the concatenated token stream") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" ")),   // 10 tokens
      (2L, (1 to 7).map(i => s"b$i").mkString(" ")),    // 7
      (3L, ""),                                          // empty → dropped
      (4L, (1 to 13).map(i => s"c$i").mkString(" ")),   // 13
      (5L, "d1 d2")                                      // 2  → 32 total
    ).toDF("doc_id", "text")
    val spans = Sampling.packSequences(df, seqLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      .sortBy(s => (s._1, s._3))

    // 32 tokens at L=8 → sequences 0..3, all full
    assert(spans.map(_._5).sum == 32)
    assert(spans.map(_._1).distinct.sameElements(Seq(0L, 1L, 2L, 3L)))
    spans.groupBy(_._1).foreach { case (_, ss) =>
      assert(ss.map(_._5).sum == 8)
      // offsets tile the sequence contiguously
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0)
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(p._3 + p._5 == n._3); case _ => ()
      }
    }
    // doc 1 fills seq 0 tokens 0-7 and spills 2 into seq 1
    assert(spans.filter(_._2 == 1L).map(s => (s._1, s._3, s._4, s._5)).toSeq ==
      Seq((0L, 0L, 0L, 8L), (1L, 0L, 8L, 2L)))
    // reconstructing by (seq, offset) order equals doc-id-order concatenation
    val rebuilt = spans.map(_._6).mkString(" ")
    val expected = ((1 to 10).map(i => s"a$i") ++ (1 to 7).map(i => s"b$i") ++
      (1 to 13).map(i => s"c$i") ++ Seq("d1", "d2")).mkString(" ")
    assert(rebuilt == expected)
    // empty doc contributes nothing
    assert(!spans.exists(_._2 == 3L))
  }

  test("tfidf top-k: rare terms outrank common ones, ranks are dense") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana common common"),
      (3L, "cherry common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2 beats common tf=1 df=3
    assert(out(1L) == Seq("apple", "banana"))
    // doc 3: cherry (df=1) beats common (df=3)
    assert(out(3L) == Seq("cherry", "common"))
    // doc 2: common tf=2 (idf ln(4/4)+1=1 → 2.0) vs banana tf=1
    // idf ln(4/3)+1 ≈ 1.2877 → common wins
    assert(out(2L) == Seq("common", "banana"))
    // k caps the output per doc
    assert(TextAnalysis.tfidfTopK(df, k = 1).count() == 3)
  }

  test("exact percentiles: nearest-rank over a known distribution") {
    import spark.implicits._
    // values 1..100 once each: p50 → 50, p90 → 90, p99 → 99, p1 → 1
    val df = (1 to 100).toDF("v")
    val out = CorpusStats.exactPercentiles(df, "v", Seq(0.01, 0.5, 0.9, 0.99))
      .as[(Double, Long)].collect().toMap
    assert(out == Map(0.01 -> 1L, 0.5 -> 50L, 0.9 -> 90L, 0.99 -> 99L))
    // duplicates: [1,1,1,9] → p50 = ceil(2)nd value = 1, p99 → 9
    val dup = Seq(1, 1, 1, 9).toDF("v")
    val o2 = CorpusStats.exactPercentiles(dup, "v", Seq(0.5, 0.99))
      .as[(Double, Long)].collect().toMap
    assert(o2 == Map(0.5 -> 1L, 0.99 -> 9L))
    // review regression: fractional values keep their type — no silent
    // long truncation ([1.4, 1.6, 2.6] p50 is 1.6, not 1)
    val frac = Seq(1.4, 1.6, 2.6).toDF("v")
    val o3 = CorpusStats.exactPercentiles(frac, "v", Seq(0.5))
      .as[(Double, Double)].collect().toMap
    assert(o3 == Map(0.5 -> 1.6))
  }

  test("exact percentiles refuse continuous domains: high cardinality trips the guard") {
    import spark.implicits._
    // a continuous-ish column: every value distinct, above the threshold —
    // the single-partition histogram window would be the full input, so
    // the operator must refuse loudly instead of running the funnel
    val cont = (1 to 500).map(i => i + 0.5).toDF("v")
    val e = intercept[IllegalArgumentException] {
      CorpusStats.exactPercentiles(cont, "v", Seq(0.5), maxDistinct = 100L).collect()
    }
    assert(e.getMessage.contains("distinct values") &&
      e.getMessage.contains("percentile_approx"))
    // bucketing first (the suggested remedy) passes the same guard and
    // yields the exact percentiles of the coarsened value
    val bucketed = cont.select(org.apache.spark.sql.functions.floor($"v").as("v"))
    val ok = CorpusStats.exactPercentiles(bucketed, "v", Seq(0.5), maxDistinct = 1000L)
      .as[(Double, Long)].collect().toMap
    assert(ok == Map(0.5 -> 250L))
  }
}
