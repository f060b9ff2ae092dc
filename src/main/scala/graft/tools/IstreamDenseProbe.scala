package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the ISTREAM diff-relation materialization
  * (`graft.rsp.diffRelationCheckpoint`): checkpoint vs lazy, 6 reps
  * each, on the heavy entries that exercise the diff — the dense
  *  10×-density single-window entry and the unequal-step multi-window
  * one. Chronological rep times printed so GC drift (late-rep spikes)
  * is attributable, [[graft.Bench]]-style. */
object IstreamDenseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "50")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = graft.SparkEntry.queries
    for (entry <- Seq("stream_window_istream_dense", "stream_multiwindow_istream",
                      "stream_window_istream", "stream_istream")) {
      // warm once per entry outside the timed loop
      all(entry)(spark, sfDir).count()
      for (ckpt <- Seq(true, false)) {
        spark.conf.set("graft.rsp.diffRelationCheckpoint", ckpt.toString)
        val times = (1 to 6).map { _ =>
          val t0 = System.nanoTime()
          val n = all(entry)(spark, sfDir).count()
          val s = (System.nanoTime() - t0) / 1e9
          System.gc()
          (s, n)
        }
        println(f"$entry%-32s ckpt=$ckpt%-5s rows=${times.head._2}%7d  " +
          times.map(t => f"${t._1}%.2f").mkString(" "))
      }
    }
    spark.conf.unset("graft.rsp.diffRelationCheckpoint")
    spark.stop()
  }
}
