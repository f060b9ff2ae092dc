package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.QuadStore
import graft.reasoner.Reasoner
import graft.sparql.SparqlParser

/** Ad-hoc profiling entry (not part of the driver contract). */
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
      .config("spark.appStateStore.asyncTracking.enable", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val edges = c.filter(col("c_custkey") >= 1).select(
      concat(lit("customer/"), col("c_custkey")).as("s"),
      lit("chain/parent").as("p"),
      concat(lit("customer/"), (col("c_custkey") / 2).cast("long")).as("o"))
    val rules = Seq(
      SparqlParser().parseRule(
        "RULE <rules/anc_base> :- CONSTRUCT { ?x <chain/anc> ?y } WHERE { ?x <chain/parent> ?y }"),
      SparqlParser().parseRule(
        "RULE <rules/anc_step> :- CONSTRUCT { ?x <chain/anc> ?z } WHERE { ?x <chain/parent> ?y . ?y <chain/anc> ?z }"))
    time("edge count") { println(edges.count()) }
    // simulate the bench's prior session state: several SPARQL queries
    // against the materialized quad table
    val all = graft.SparkEntry.queries
    Seq("sparql_scan", "sparql_bgp_join", "sparql_star_join", "sparql_filter_arith",
        "sparql_groupby_agg", "sparql_orderby_limit", "sparql_subquery",
        "sparql_union", "sparql_distinct").foreach { n =>
      time(n) { all(n)(spark, sfDir).count() }
      System.gc()
    }
    val r = new Reasoner(spark)
    val closed = time("semi-naive closure AFTER sparql queries") {
      r.materializeSemiNaive(edges.select("s", "p", "o"), rules)
    }
    time("closure count") { println(closed.count()) }
    spark.stop()
  }
}
