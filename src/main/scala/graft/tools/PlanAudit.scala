package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints the formatted physical plan of selected driver queries — the
  * explain audit loop: confirm PushedFilters on quad/table scans, pruned
  * ReadSchema, broadcast joins on dimensions, and whole-stage codegen
  * coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("sparql_bgp_join", "q3_shipping_priority", "similarity_topk", "dedup_minhash_lsh")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
