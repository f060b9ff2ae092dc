package graft.tools

import org.apache.spark.sql.SparkSession

/** Check whether the subject-bucketed quad table eliminates the star-join
  * exchanges in the compiled SPARQL plan (debug tool). */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = graft.relational.Triplizer.bucketedStore(spark, sfDir)
    val df = new graft.sparql.Compiler(store).select("""
      SELECT ?name ?bal ?seg WHERE {
        ?c <customer#c_name> ?name .
        ?c <customer#c_acctbal> ?bal .
        ?c <customer#c_mktsegment> ?seg }""")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES: " + "Exchange".r.findAllIn(plan).length)
    println(plan.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
