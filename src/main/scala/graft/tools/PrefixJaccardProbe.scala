package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, DoubleType}

/** Stage-volume decomposition of [[graft.pipeline.Dedup.prefixJaccardPairs]]
  * at an arbitrary corpus (r9: the 100× probe point wedged the Sf100Probe
  * JVM — old gen 99.94%, 8 full GCs — before any entry line printed; this
  * probe replays the kernel's stages one count at a time so the stage
  * whose volume explodes is a printed NUMBER, not a heap dump).
  *
  * Usage: PrefixJaccardProbe <docsDir> — e.g. /tmp/graft_sf10.
  */
object PrefixJaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 3; val threshold = 0.5; val hotVocabCap = 1 << 16
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pj-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val arr = docs.select(col("doc_id").as("id"),
        graft.functions.ShingleHashes.ofColumn(col("text"), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    t("docs")(docs.count())
    val totalShingles = t("total shingles")(
      arr.agg(sum(size(col("sh")))).head().getLong(0))
    val dfAgg = arr.sample(withReplacement = false, 0.1, seed = 421017L)
      .select(explode(col("sh")).as("shh"))
      .groupBy("shh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2L)
    val hotN = t("sampled df>=2 vocab")(dfAgg.count())
    // collect ONCE and derive both the stage-volume count and the map from
    // the same array — a second collect would double the very driver-heavy
    // stage this probe exists to attribute
    var hotRowsArr: Array[org.apache.spark.sql.Row] = Array.empty
    val hotRows = t("hot map TakeOrdered") {
      hotRowsArr = dfAgg.orderBy(col("df").desc, col("shh").asc)
        .limit(hotVocabCap + 1).collect()
      hotRowsArr.length
    }
    val hotMap = hotRowsArr.take(hotVocabCap)
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    println(s"[pj-probe] hot map size ${hotMap.size}, max df ${if (hotMap.nonEmpty) hotMap.values.max else 0}")
    val hotB = spark.sparkContext.broadcast(hotMap)
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
    import graft.pipeline.Dedup.ceilMulExact
    val prefix = arr
      .withColumn("n_sh", size(col("sh")).cast(LongType))
      .withColumn("pfx", prefixUdf(col("sh"),
        (col("n_sh") - ceilMulExact(threshold, col("n_sh")) + 1).cast(IntegerType)))
      .select(col("id"), col("n_sh"), posexplode(col("pfx")))
      .select(col("id"), col("n_sh"), (col("pos") + 1).cast(LongType).as("pos"),
        col("col").as("shh"))
      .localCheckpoint()
    t("prefix posting rows")(prefix.count())
    // the candidate join's per-key fanout: the heaviest prefix postings
    val top = t("top posting lists")(
      prefix.groupBy("shh").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc).limit(5).collect()
        .map(r => r.getLong(1)).mkString(","))
    println(s"[pj-probe] heaviest prefix-posting lists: $top")
    val sumSq = t("sum of |postings|^2")(
      prefix.groupBy("shh").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c"))).head().getLong(0))
    println(s"[pj-probe] candidate upper bound (sum c^2) = $sumSq; total shingles = $totalShingles")
    // the candidate join materializes ~sumSq/2 pairs into a distinct();
    // past ~2B pairs that is a single-node heap/disk bomb, and the probe
    // has already measured what it came for (the per-key fanout) — refuse
    // the join loudly instead of wedging the JVM in full-GC
    val candBound = sys.env.get("PJ_PROBE_MAX_CAND").map(_.toLong).getOrElse(2000000000L)
    if (sumSq > candBound) {
      println(s"[pj-probe] REFUSING candidate join: sum c^2 = $sumSq > $candBound " +
        "(birthday-quadratic candidate volume — prefix filtering cannot prune " +
        "a corpus whose shingle vocabulary is tiny relative to its size; " +
        "the LSH path is the scale alternative on such data)")
      spark.stop(); return
    }
    val tNum = math.floor(threshold * 1e6).toLong
    val alpha = ((lit(tNum) * (col("a.n_sh") + col("b.n_sh")) +
      lit(1000000L + tNum - 1)) / lit(1000000L + tNum)).cast(LongType)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shh") === col("b.shh") && col("a.id") < col("b.id") &&
          col("b.n_sh").cast(DoubleType) >= lit(threshold) * col("a.n_sh") &&
          col("a.n_sh").cast(DoubleType) >= lit(threshold) * col("b.n_sh") &&
          least(col("a.n_sh") - col("a.pos"), col("b.n_sh") - col("b.pos")) +
            lit(1L) >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("distinct candidates")(cand.count())
    val sets = arr.select(col("id"), col("sh").as("set"))
    val scored = cand
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("uni", size(col("set_a")) + size(col("set_b")) - col("inter"))
    val out = t("verified pairs")(
      scored.filter(col("inter").cast(DoubleType) >= lit(threshold) * col("uni")).count())
    println(s"[pj-probe] DONE pairs=$out")
    spark.stop()
  }
}
