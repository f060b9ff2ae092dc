package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why is bm25TopK on the wide-vocab corpus SLOWER at 10× than at 100×
  * (systematic across three WideVocabProbe runs: ~64-195 s vs ~39-65 s)?
  * Prints the executed plan and stage timings at both scales. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bm25-probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
      r
    }
    Seq("10x", "100x").foreach { label =>
      val d = spark.read.parquet(s"/tmp/graft_widevocab_$label/documents.parquet")
      val q = WideVocabProbe.queries(spark, 50)
      val df = graft.pipeline.Retrieval.bm25TopK(d, q, k = 10)
      t(s"$label run1")(df.count())
      t(s"$label run2")(df.count())
      println(s"=== $label executed plan ===")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
