package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does pre-partitioning the static edge table by the join key
  * before its one-time checkpoint remove the per-iteration edge shuffle
  * in pageRank? (The r6 measurement said pre-partitioning DOUBLED wall
  * because the checkpoint leaf hid the partitioning from the optimizer;
  * the r8 CheckpointBridge preserves outputPartitioning AND installs
  * measured stats, so re-measure at the 10×/100× probe points where the
  * edge shuffle dominates — the e₂ = 1.17 probe signal.) */
object PageRankPartProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edges(dir: String) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      li.select((col("l_orderkey") * 4).as("src"), (col("l_partkey") * 4 + 1).as("dst"))
        .unionAll(li.select((col("l_partkey") * 4 + 1).as("src"),
          (col("l_suppkey") * 4 + 2).as("dst")))
    }
    dirs.foreach { dir =>
      for (pre <- Seq(false, true); rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.pipeline.GraphOps.pageRank(edges(dir), iters = 3,
          checkpoint = false, prePartition = pre).count()
        println(f"[prpart] $dir pre=$pre rep$rep: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n nodes)")
        System.gc()
      }
    }
    spark.stop()
  }
}
