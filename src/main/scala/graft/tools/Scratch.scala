package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Ad-hoc profiling entry (not part of the driver contract). Currently:
  * stage decomposition of the MinHash-LSH pipeline on the Sf1Probe 10×
  * corpus — locating the 3.9 s → 106 s blowup the r6 probe measured
  * (candidate-pair volume vs signature cost vs verify cost). NOTE:
  * single-shot timings here run without the Bench harness's
  * status-store caps and inter-query GC — treat them as direction, not
  * measurement; confirm with `SPARK_GRAFT_BENCH_ONLY=<entry> graft.Bench`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[scratch] docs=${docs.count()} partitions=${docs.rdd.getNumPartitions}")
    time("tokens only") {
      println(docs.select(graft.pipeline.TextAnalysis.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).first())
    }
    time("shingle rows") {
      println(Dedup.shingles(docs, 3).count())
    }
    (1 to 3).foreach { i =>
      time(s"entry cp=false rep$i") {
        println(Dedup.minHashLshPairs(docs, k = 3, numHashes = 32, bands = 8,
          threshold = 0.5, checkpointSigs = false).count())
      }
    }
    (1 to 3).foreach { i =>
      time(s"entry cp=true rep$i") {
        println(Dedup.minHashLshPairs(docs, k = 3, numHashes = 32, bands = 8,
          threshold = 0.5, checkpointSigs = true).count())
      }
    }
    spark.stop()
  }
}
