package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage decomposition probe for the streaming MinHash replay: how much
  * of `dedup_minhash_stream` is signature hashing vs state machinery.
  * Prints the md5 count in the narrow-signature optimized plan (the
  * CollapseProject-inlining check) and times each stage separately. */
object MhStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val sigs = graft.pipeline.Dedup.minHashSignaturesNarrow(docs, 3, 32,
      portableHashes = true)
    val plan = sigs.queryExecution.optimizedPlan.toString
    println(s"md5 occurrences in narrow-sig optimized plan: " +
      "md5".r.findAllIn(plan).length)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm JIT once
    sigs.count()
    time("narrow sigs x1 (batch, 32-way)")(sigs.count())
    time("narrow sigs x1 (single partition)")(
      graft.pipeline.Dedup.minHashSignaturesNarrow(docs.coalesce(1), 3, 32,
        portableHashes = true).count())
    for (rep <- 1 to 3)
      time(s"full streaming replay rep$rep")(
        graft.queries.PipelineSuite.queries("dedup_minhash_stream")(spark, sfDir).count())

    // per-batch decomposition of the replay harness
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[(Long, Long, String)]
      val feed = mem.toDF().toDF("tms", "doc_id", "text")
        .repartition(8, col("doc_id"))
        .withColumn("ts", timestamp_millis(col("tms")))
      val pairs = graft.pipeline.Dedup.streamingMinHashPairs(feed, "ts", "30 days",
        k = 3, numHashes = 32, bands = 8, threshold = 0.5, portableHashes = true)
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      val sq = time("writeStream start")(
        pairs.writeStream.format("memory").queryName("mhprobe")
          .outputMode("append").start())
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      val base = 1700000000000L
      val rows = docs.select(col("doc_id").cast("long"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 5 + 1)).zipWithIndex.foreach { case (g, i) =>
        time(s"batch $i addData")(
          mem.addData(g.toSeq.map { case (id, tx) => (base + id, id, tx) }))
        time(s"batch $i processAllAvailable")(sq.processAllAvailable())
      }
      println("trigger history: " + sq.recentProgress.map(p =>
        s"#${p.batchId}:${p.durationMs.get("triggerExecution")}ms/${p.numInputRows}r").mkString(" "))
      // full per-phase durations: where did the trigger time go
      // (addBatch = job execution; queryPlanning = analyzer/optimizer;
      // walCommit/commitOffsets = checkpoint io; getBatch = source)
      sq.recentProgress.foreach(p =>
        println(s"  #${p.batchId} rows=${p.numInputRows} " + p.durationMs.entrySet()
          .toArray.map(_.toString).sorted.mkString(" ")))
      sq.stop()
      println(s"pairs: ${spark.table("mhprobe").dropDuplicates("id_a", "id_b").count()}")
    }
    spark.stop()
  }
}
/** Batch signature formulation A/B: explode + partial-agg vs the
  * compiled narrow kernel, both families, sf0.1 corpus. */
object MhBatchSigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32).cache()
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"$label rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    for (portable <- Seq(false, true)) {
      time(s"explode+agg portable=$portable")(
        graft.pipeline.Dedup.minHashSignatures(docs, 3, 32, portableHashes = portable).count())
      time(s"narrow kernel portable=$portable")(
        graft.pipeline.Dedup.minHashSignaturesNarrow(docs, 3, 32, portableHashes = portable).count())
    }
    spark.stop()
  }
}
/** One-off codegen health check for the shingle kernels. */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    println("== ShingleHashes only ==")
    docs.select(graft.functions.ShingleHashes.ofColumn(col("text"), 3)).count()
    println("== ShingleArray only ==")
    docs.select(graft.functions.ShingleArray.ofColumn(col("text"), 3)).count()
    println("== MinHashSig only ==")
    docs.select(graft.functions.MinHashSig.ofColumn(col("text"), 3, 32, true)).count()
    println("== done (any codegen WARN above came from a kernel) ==")
    spark.stop()
  }
}
/** SemDedup k-scaling check: at 10× corpus with k scaled 10× (constant
  * expected cell occupancy, the published recipe), the pair join should
  * return to corpus-linear cost vs the fixed-k entry's Σ|cell|² blowup. */
object SemDedupScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb10 = spark.read.parquet("/tmp/graft_sf1/embeddings.parquet")
    println(s"rows: ${emb10.count()}")
    for (k <- Seq(8, 80); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.Dedup.semDedupPairs(emb10, threshold = 0.35,
        nClusters = k, iters = 2).count()
      println(f"k=$k rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
      System.gc()
    }
    spark.stop()
  }
}
