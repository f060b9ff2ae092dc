package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time selected driver entries back-to-back in one
  * warmed session (not driver contract). Usage:
  *   run_main.sh graft.tools.Probe <sfDir> <name> [name...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("datalog_closure_seminaive", "prob_minmax_closure")
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
    val all = graft.SparkEntry.queries
    // warmup: JIT + codegen paths
    all("sparql_scan")(spark, sfDir).count()
    System.gc()
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = all(n)(spark, sfDir).count()
      println(f"[probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      System.gc()
    }
    spark.stop()
  }
}
