package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Physical-plan posture assertions — the properties that decide whether
  * a plan survives a 100× scale-up, pinned as tests so a regression in
  * filter pushdown, broadcast choice, or codegen coverage fails loudly
  * instead of silently degrading the bench: filters reach the parquet
  * scan (`PushedFilters`), projections prune (`ReadSchema`), dimension
  * joins broadcast, and the hot operators stay inside whole-stage
  * codegen.
  */
class PlanPostureSpec extends SparkSpec {

  /** Execute first so AQE finalizes the physical plan — the adaptive
    * plan string only shows codegen spans / realized joins afterwards. */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.count()
    df.queryExecution.executedPlan.toString
  }

  test("q6: filters are pushed to the parquet scan, columns pruned") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: [") && p.contains("IsNotNull"),
      s"no pushed filters in:\n$p")
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q5: dimension joins are broadcast, not shuffled") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("similarity_topk: the query side broadcasts (no n×m shuffle)") {
    val p = plan("similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"no broadcast in:\n$p")
  }

  test("q1: partial (map-side) aggregation, inside whole-stage codegen") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), s"no hash aggregate in:\n$p")
    assert(p.contains("partial_sum"), s"no map-side partial aggregation in:\n$p")
    val codegen = SparkEntry.queries("q1_pricing_summary")(spark, sf())
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen subtree in:\n$codegen")
  }

  test("text analysis stays narrow: no exchange in the plan") {
    val p = plan("text_token_count")
    assert(!p.contains("Exchange"), s"unexpected shuffle in:\n$p")
  }

  test("sparql scan pushes the predicate filter to the quad store scan") {
    val p = plan("sparql_scan")
    assert(p.contains("PushedFilters: [") &&
      (p.contains("EqualTo") || p.contains("IsNotNull")),
      s"no pushdown on the quads scan in:\n$p")
  }
}
