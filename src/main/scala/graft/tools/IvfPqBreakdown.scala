package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Stage-decomposition probe for [[Similarity.ivfPqTopK]]'s 1× constant
  * (the entry is sublinear across both probe decades — e₁ 0.42 /
  * e₂ 0.36 — but its sf0.1 steady state started at ~6.6 s, mostly
  * fixed overhead; this prints where). */
object IvfPqBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm full") { Similarity.ivfPqTopK(e, q, 5, 8, 3).count() }
    t("kmeansMicro k=8 ckpt") { Similarity.kmeansMicro(e, 8, 2).count() }
    t("kmeansMicro k=16 ckpt") { Similarity.kmeansMicro(e, 16, 2).count() }
    t("full ivfPqTopK") { Similarity.ivfPqTopK(e, q, 5, 8, 3).count() }
    t("full again") { Similarity.ivfPqTopK(e, q, 5, 8, 3).count() }
    spark.stop()
  }
}
