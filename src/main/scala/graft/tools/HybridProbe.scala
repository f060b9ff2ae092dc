package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the hybrid ladder's cost structure (debug tool). */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hybrid-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val q = graft.SparkEntry.queries
    // warmup
    q("sparql_scan")(spark, sfDir).count()
    time("full (recover gate, checkpoint)")(q("prob_hybrid_twohop")(spark, sfDir).count())
    time("full again")(q("prob_hybrid_twohop")(spark, sfDir).count())
    // lazy path: no checkpoint, count() may prune the ladder UDF
    import graft.prob.ProbReasoner
    import graft.sparql.SparqlParser
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val seeds = c.filter(col("c_custkey") >= 1).select(
      concat(lit("customer/"), col("c_custkey")).as("s"),
      lit("chain/parent").as("p"),
      concat(lit("customer/"), (col("c_custkey") / 2).cast("long")).as("o"),
      (lit(0.5) + (col("c_custkey") % 8).cast("double") / 32.0).as("prob"))
    val rule = SparqlParser().parseRule(
      """RULE <rules/anc2> PROB(provenance=hybrid, threshold=0.5) :-
         CONSTRUCT { ?x <chain/anc2> ?z }
         WHERE { ?x <chain/parent> ?y . ?y <chain/parent> ?z }""")
    time("lazy recover=false count") {
      ProbReasoner.hybridMaterialize(spark, seeds, rule, rule.prob.get,
        recover = false).count()
    }
    time("lazy recover=false count again") {
      ProbReasoner.hybridMaterialize(spark, seeds, rule, rule.prob.get,
        recover = false).count()
    }
    spark.stop()
  }
}
