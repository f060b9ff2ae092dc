package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisect the in-session drag on late bench entries (r8: graph_components
  * 3.0-3.9 s isolated vs 4.7-5.4 s after 30-115 prior entries): run a
  * filler workload, dump what ACCUMULATED (persisted RDD blocks, thread
  * count, broadcast cleanup backlog), then time the graph family. */
object SessionDragProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    def dump(label: String): Unit = {
      val rdds = spark.sparkContext.getRDDStorageInfo
      val mem = rdds.map(_.memSize).sum / 1e6
      val disk = rdds.map(_.diskSize).sum / 1e6
      println(f"[drag] $label: persistedRDDs=${rdds.length} mem=$mem%.0fMB disk=$disk%.0fMB " +
        s"threads=${Thread.activeCount()} " +
        s"shuffles=${new java.io.File(System.getProperty("java.io.tmpdir")).listFiles().count(f => f.getName.startsWith("blockmgr") || f.getName.startsWith("spark"))}")
      import scala.jdk.CollectionConverters._
      val census = Thread.getAllStackTraces.keySet.asScala.toSeq
        .map(_.getName.replaceAll("[0-9]+", "N"))
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy(-_._2).take(8)
      println(s"[drag]   top threads: ${census.map { case (n, c) => s"$n×$c" }.mkString(" ")}")
    }
    def time(name: String): Double = {
      val t0 = System.nanoTime(); all(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9; System.gc(); s
    }
    val graph = Seq("graph_pagerank", "graph_components", "graph_bfs_hops", "prob_sdd_wmc")
    dump("fresh")
    graph.foreach(n => println(f"[drag] fresh $n: ${time(n)}%.2f s (warm ${time(n)}%.2f)"))
    dump("after graph")
    val filler = Seq("sparql_scan", "sparql_bgp_join", "sparql_star_join",
      "sparql_filter_arith", "sparql_groupby_agg", "sparql_subquery",
      "sparql_union", "sparql_watdiv_l2", "sparql_watdiv_s1", "sparql_watdiv_c3",
      "datalog_closure_seminaive", "stream_tumbling_agg", "stream_sliding_agg",
      "stream_window_bgp", "stream_window_istream", "ml_predict_fixed",
      "prob_minmax_closure", "dedup_minhash_lsh", "dedup_prefix_jaccard",
      "similarity_pq_topk", "similarity_ivf_portable", "text_bm25_topk",
      "pipeline_bpe_train", "events_asof_join", "lm_nll_trigram")
    filler.foreach { n => time(n) }
    dump("after 25 filler")
    graph.foreach(n => println(f"[drag] post-filler $n: ${time(n)}%.2f s (${time(n)}%.2f)"))
    dump("end")
    spark.stop()
  }
}
