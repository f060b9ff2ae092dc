package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the WatDiv workload over the plain cached quad store vs the
  * subject-BUCKETED layout (VERDICT r7 item 6: S1 spends its 2.2 s on 7
  * scans + self-joins of the same triplized quads; the bucketed store
  * exists precisely to kill that shuffle). Prints per-slot medians for
  * both stores plus the one-time bucket write cost, so the routing
  * decision is a measured trade, not a guess. */
object WatDivBucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val slots = if (args.length > 1) args(1).split(",").toSeq
      else Seq("sparql_watdiv_s1", "sparql_watdiv_s2", "sparql_watdiv_s6",
        "sparql_watdiv_s7", "sparql_watdiv_c1", "sparql_watdiv_c3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plain = new graft.sparql.Compiler(
      graft.relational.Triplizer.cachedStore(spark, sfDir, defaultGraph = true))
    val t0 = System.nanoTime()
    val bucketed = new graft.sparql.Compiler(
      graft.relational.Triplizer.bucketedStore(spark, sfDir, defaultGraph = true))
    println(f"[watdiv-bucket] bucketed store ready in ${(System.nanoTime() - t0) / 1e9}%.1f s (one-time write or catalog reuse)")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(c: graft.sparql.Compiler, q: String): Double = {
      val t = System.nanoTime(); c.select(q).count(); val s = (System.nanoTime() - t) / 1e9
      System.gc(); s
    }
    slots.foreach { slot =>
      val q = graft.queries.WatDivSuite.sparqlText(slot)
      time(plain, q); time(bucketed, q) // one untimed warm rep each
      val tp = (1 to 5).map(_ => time(plain, q))
      val tb = (1 to 5).map(_ => time(bucketed, q))
      println(f"[watdiv-bucket] $slot%-20s plain=${median(tp)}%6.2f (min ${tp.min}%5.2f)  " +
        f"bucketed=${median(tb)}%6.2f (min ${tb.min}%5.2f)  speedup=${median(tp) / median(tb)}%5.2fx")
    }
    spark.stop()
  }
}
