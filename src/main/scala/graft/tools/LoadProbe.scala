package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-load breakdown: where the one-time quad materialization goes
  * (r11 — the driver's bench session pays this before any entry). */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[load] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val n = t("triplize+write (cachedStore)") {
      graft.relational.Triplizer.cachedStore(spark, sfDir).quads.count()
    }
    println(s"[load] quad rows: $n")
    t("bucketBy write (bucketedStore)") {
      graft.relational.Triplizer.bucketedStore(spark, sfDir).quads.count()
    }
    t("re-read cached") {
      graft.relational.Triplizer.cachedStore(spark, sfDir).quads.count()
    }
    spark.stop()
  }
}
