package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-bytes/codec A-B for the quad layout (r11): the sandbox's cold
  * load is writeback-bound, so compressed size ~= wall. */
object LoadProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[load3] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def sz(p: String): String = {
      val d = new java.io.File(p)
      val b = Option(d.listFiles()).getOrElse(Array.empty).map(_.length()).sum
      f"${b / 1e6}%.0f MB"
    }
    val q = graft.relational.Triplizer.quads(spark, sfDir)
    t("warm compute (noop)") { q.write.format("noop").mode("overwrite").save() }
    val n = spark.sparkContext.defaultParallelism
    t("range+sort+parquet snappy") {
      q.repartitionByRange(n, col("p"), col("s")).sortWithinPartitions("p", "s")
        .write.mode("overwrite").parquet("/tmp/lp3_snappy")
    }
    println("[load3] snappy size: " + sz("/tmp/lp3_snappy"))
    t("range+sort+parquet zstd") {
      q.repartitionByRange(n, col("p"), col("s")).sortWithinPartitions("p", "s")
        .write.mode("overwrite").option("compression", "zstd").parquet("/tmp/lp3_zstd")
    }
    println("[load3] zstd size: " + sz("/tmp/lp3_zstd"))
    val rs = t("read back snappy (noop)") {
      spark.read.parquet("/tmp/lp3_snappy").write.format("noop").mode("overwrite").save()
    }
    val rz = t("read back zstd (noop)") {
      spark.read.parquet("/tmp/lp3_zstd").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
