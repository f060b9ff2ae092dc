package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank semantics: equality with a driver-side reference (including
  * dangling-mass redistribution and multigraph edges), rank conservation,
  * and partition invariance. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // a → b, a → c, b → c, plus dangling d pointed at by c; duplicate
  // edge b → c (multigraph: counts twice in outdeg and contribution)
  private val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "c"), ("c", "d")
  ).toDF("src", "dst")

  private def refPageRank(es: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val out = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(pr).sum
      val in = es.groupBy(_._2).map { case (t, g) =>
        t -> g.map(e => pr(e._1) / out(e._1)).sum }
      pr = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    pr
  }

  test("matches the driver-side reference on a dangling multigraph") {
    val got = GraphOps.pageRank(edges, iters = 4, checkpoint = false)
      .as[(String, Double)].collect().toMap
    val ref = refPageRank(Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("b", "c"), ("c", "d")), 4, 0.85)
    assert(got.keySet == ref.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - ref(v)) < 1e-6, s"$v: $p vs ${ref(v)}") }
    // c has two in-neighbors (one doubled) → highest-ranked non-sink
    assert(got("c") > got("b") && got("c") > got("a"))
  }

  test("total rank is conserved (sums to 1 with dangling redistribution)") {
    val got = GraphOps.pageRank(edges, iters = 7, checkpoint = true)
      .agg(sum("pr")).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-4, s"rank sum $got")
  }

  test("partition-count invariant") {
    def run(parts: Int) = GraphOps.pageRank(edges.repartition(parts), iters = 3)
      .as[(String, Double)].collect().toMap
    assert(run(1) == run(8))
  }
}
