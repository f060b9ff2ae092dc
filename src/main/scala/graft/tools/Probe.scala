package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc micro-probe for the filter_arith hot path (not driver contract). */
object Probe {
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
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
      r
    }
    val quads = spark.read.parquet("/tmp/graft_quads/" + new java.io.File(sfDir).getName + "_d")
    val price = quads.filter(col("g").isNull && col("p") === "lineitem#l_extendedprice")
      .select(col("s").as("li"), col("o").as("price"))
    val disc = quads.filter(col("g").isNull && col("p") === "lineitem#l_discount")
      .select(col("s").as("li"), col("o").as("disc"))
    time("scan price leg count")(println(price.count()))
    time("scan disc leg count")(println(disc.count()))
    time("join 1")(println(price.join(disc, "li").count()))
    time("join 2 (repeat)")(println(price.join(disc, "li").count()))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    time("join, AQE coalesce off")(println(price.join(disc, "li").count()))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("join, AQE off")(println(price.join(disc, "li").count()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val price32 = price.repartition(32, col("li"))
    val disc32 = disc.repartition(32, col("li"))
    time("join, pre-repartitioned 32")(println(price32.join(disc32, "li").count()))
    val all = graft.SparkEntry.queries
    time("compiled sparql_filter_arith 1")(println(all("sparql_filter_arith")(spark, sfDir).count()))
    time("compiled sparql_filter_arith 2")(println(all("sparql_filter_arith")(spark, sfDir).count()))
    time("compiled sparql_bgp_join")(println(all("sparql_bgp_join")(spark, sfDir).count()))
    spark.stop()
  }
}
