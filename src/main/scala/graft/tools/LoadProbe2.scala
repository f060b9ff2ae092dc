package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the cold triplize+write: compute vs shuffle vs sort vs
  * write, and layout alternatives (r11 _load_quads investigation). */
object LoadProbe2 {
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
      println(f"[load2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.relational.Triplizer.quads(spark, sfDir)
    t("compute only (noop sink)") {
      q.write.format("noop").mode("overwrite").save()
    }
    t("compute only again") {
      q.write.format("noop").mode("overwrite").save()
    }
    t("repartition(p)+sort+noop") {
      q.repartition(col("p")).sortWithinPartitions("p", "s")
        .write.format("noop").mode("overwrite").save()
    }
    t("current: repartition(p)+sort+parquet") {
      q.repartition(col("p")).sortWithinPartitions("p", "s")
        .write.mode("overwrite").parquet("/tmp/lp2_current")
    }
    t("range(32,p,s)+sort+parquet") {
      q.repartitionByRange(32, col("p"), col("s")).sortWithinPartitions("p", "s")
        .write.mode("overwrite").parquet("/tmp/lp2_range")
    }
    spark.stop()
  }
}
