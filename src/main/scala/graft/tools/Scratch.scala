package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.relational.Triplizer
import graft.sparql.Compiler

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warmup") { spark.range(10000000L).agg(sum("id")).collect() }
    val store = time("cachedStore build") { Triplizer.cachedStore(spark, sfDir) }
    time("quads count") { store.quads.count() }
    val c = new Compiler(store)
    val df = c.select("""
      SELECT ?c ?nname ?rname WHERE {
        ?c <customer#c_nationkey> ?n .
        ?n <nation#n_name> ?nname .
        ?n <nation#n_regionkey> ?r .
        ?r <region#r_name> ?rname }""")
    time("bgp_join count") { println(df.count()) }
    time("bgp_join count again") { println(df.count()) }
    spark.stop()
  }
}
