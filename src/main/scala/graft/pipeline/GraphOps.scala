package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge lists (beyond-reference: the
  * reference reasons over the RDF graph but has no whole-graph
  * analytics). Near-dup clustering already does label-propagation
  * connected components ([[Dedup.nearDupClusters]]); this adds PageRank,
  * the standard importance measure for entity graphs.
  */
object GraphOps {

  /** PageRank by power iteration (Page et al. 1999), with dangling-mass
    * redistribution: pr'(v) = (1−d)/N + d·(Σ_{u→v} pr(u)/out(u) + D/N)
    * where D is the total rank held by nodes with no out-edges.
    *
    * Scale shape — the Pregel-as-join formulation: each iteration is ONE
    * edge-keyed join (contributions = pr/outdeg shipped along edges) and
    * ONE dst-keyed aggregation; rank state is a (node, pr) table
    * partitioned by node, localCheckpoint-ed per round with the previous
    * round eagerly unpersisted (the fixpoint hygiene the reasoners use —
    * a mostly-idle heap never fires the weak-ref cleaner). The dangling
    * term is a one-row aggregate collected to the driver. No adjacency
    * ever materializes on the driver; iterations are O(|E|) shuffles.
    *
    * Returns (node, pr) with pr rounded to 6 decimals — deterministic,
    * so an unrolled-SQL mirror reproduces it bit-for-bit. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1, s"pageRank iters $iters must be >= 1")
    require(damping > 0 && damping < 1, s"damping $damping must be in (0, 1)")
    // (measured: pre-repartitioning the static sides by join key before
    // the checkpoint DOUBLED the wall time at sf0.1 — the checkpointed
    // LogicalRDD does not expose the partitioning to the optimizer, so
    // the per-round joins re-shuffled anyway and the upfront exchanges
    // were pure cost. The simple form below is the fast one.)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (checkpoint) e0.localCheckpoint() else e0
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    // nodes joined with outdeg once: dangling nodes carry outdeg null
    val base0 = nodes.join(outdeg, Seq("node"), "left_outer")
    val base = if (checkpoint) base0.localCheckpoint() else base0
    val n = base.count().toDouble
    require(n > 0, "pageRank: empty graph")
    var pr = base.withColumn("pr", lit(1.0 / n))
    if (checkpoint) pr = pr.localCheckpoint()
    for (_ <- 1 to iters) {
      val dangling = pr.filter(col("outdeg").isNull)
        .agg(coalesce(sum("pr"), lit(0.0))).head().getDouble(0)
      val contribs = e.join(pr.filter(col("outdeg").isNotNull), e("src") === pr("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      val next = base.join(contribs, Seq("node"), "left_outer")
        .withColumn("pr", lit((1.0 - damping) / n) +
          lit(damping) * (coalesce(col("__in"), lit(0.0)) + lit(dangling / n)))
        .drop("__in")
      val prev = pr
      pr = if (checkpoint) next.localCheckpoint() else next
      // Dataset.unpersist is a no-op for checkpoint blocks (it only
      // uncaches CacheManager entries); drop the backing RDD directly
      if (checkpoint) graft.reasoner.Reasoner.unpersistCheckpoint(prev)
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }
}
