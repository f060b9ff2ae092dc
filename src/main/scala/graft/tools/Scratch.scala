package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Contamination, TextAnalysis}

/** Ad-hoc profiling entry (not part of the driver contract). Currently:
  * stage timing of the contamination sweep at sf0.1 — the probe that
  * located the single-input-split gram HOF cost (fixed by entry-side
  * repartition + pre-tokenized lambda + checkpointGrams; numbers in
  * [[Contamination.contaminatedPairs]]'s Scaladoc). NOTE: single-shot
  * timings here run without the Bench harness's status-store caps and
  * inter-query GC — treat them as direction, not measurement; confirm
  * with `SPARK_GRAFT_BENCH_ONLY=<entry> graft.Bench`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
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
      .repartition(spark.sparkContext.defaultParallelism)
    val pre = docs.select(col("doc_id"), TextAnalysis.tokens(trim(col("text"))).as("__toks"))
    val grams = pre.select(col("doc_id"), explode(array_distinct(
      TextAnalysis.ngramsOfTokens(col("__toks"), 3))).as("gram"))
    time("gram rows") { println(grams.count()) }
    time("keep list") {
      println(grams.groupBy("gram").agg(count(lit(1)).as("c"))
        .filter(col("c") <= 20).count())
    }
    val bench = docs.filter(col("doc_id") % 50 === 0)
    (1 to 3).foreach { i =>
      time(s"full entry rep $i") {
        println(Contamination.contaminatedPairs(docs, bench, n = 3,
          minShared = 2, maxDf = Some(20), checkpointGrams = true).count())
      }
    }
    spark.stop()
  }
}
