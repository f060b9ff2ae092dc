package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-entry structural cost: Spark jobs, stages, tasks, and wall per
  * driver entry (r11 optimization round). At sf0.1 the data is 17 MB, so
  * wall time is dominated by fixed per-job/per-stage overhead — this
  * probe names the entries whose job/stage counts are out of line with
  * the work they do, which is where plan restructuring (fewer blocking
  * actions, shared scans, fused aggregations) pays.
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    val all = graft.SparkEntry.queries
    graft.relational.Triplizer.cachedStore(spark, sfDir).quads.count()
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    if (names.exists(_.startsWith("sparql_watdiv_")))
      graft.relational.Triplizer.bucketedStore(spark, sfDir).quads.count()
    println(f"${"entry"}%-38s jobs stages tasks  wall")
    names.foreach { n =>
      try { all(n)(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      Thread.sleep(50)
      val (j0, s0, t0) = (jobs, stages, tasks)
      val w0 = System.nanoTime()
      try { all(n)(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"$n FAILED: $e") }
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(50) // let listener events drain
      println(f"$n%-38s ${jobs - j0}%4d ${stages - s0}%6d ${tasks - t0}%5d  $wall%6.2f")
      System.gc()
    }
    spark.stop()
  }
}
