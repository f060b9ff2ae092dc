package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a single driver entry and show its result (debug tool). */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(10, truncate = false)
    println(s"rows=${df.count()}")
    // optional third arg: verify-style parquet dump dir
    args.drop(2).headOption.foreach { outDir =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    spark.stop()
  }
}
