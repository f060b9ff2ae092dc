package graft.reasoner

import graft.SparkSpec
import graft.sparql.SparqlParser
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotated/provenance + cross-window reasoning, mirroring the
  * reference's differential oracle (naive ≡ incremental,
  * `datalog/tests/cross_window_tests.rs`) and expiry behavior
  * (`rsp_engine_test.rs:977`). */
class CrossWindowSpec extends SparkSpec {
  import spark.implicits._

  private def parse(r: String) = SparqlParser().parseRule(r)

  private val congestion = parse(
    """RULE <r/cong> :- CONSTRUCT { ?road <state> "congested" }
       WHERE { ?road <traffic> "high" . ?road <parking> "full" }""")

  private def content(rows: (String, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("s", "p", "o", "event_time")

  private def liveFacts(df: DataFrame): Set[(String, String, String)] =
    df.select("s", "p", "o").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("min-max probability semiring: derived tag = min of premises, max across derivations") {
    val r = new AnnotatedReasoner(spark, Semiring.minMaxProbability)
    val facts = Seq(
      ("a", "p", "x", 0.9), ("x", "q", "b", 0.6), // path1: min = 0.6
      ("a", "p", "y", 0.8), ("y", "q", "b", 0.7)) // path2: min = 0.7 → max 0.7
      .toDF("s", "p", "o", "tag")
    val rule = parse(
      """RULE <r/c> :- CONSTRUCT { ?a <conn> ?b } WHERE { ?a <p> ?x . ?x <q> ?b }""")
    val out = r.materialize(facts, Seq(rule))
    val conn = out.filter(col("p") === "conn").collect().map(r0 =>
      (r0.getString(0), r0.getString(2), r0.getDouble(3)))
    assert(conn.toSeq == Seq(("a", "b", 0.7)))
  }

  test("recursive annotated closure converges (cycle-safe via tag improvement)") {
    val r = new AnnotatedReasoner(spark, Semiring.minMaxProbability)
    val facts = Seq(("a", "e", "b", 0.9), ("b", "e", "c", 0.8), ("c", "e", "a", 0.5))
      .toDF("s", "p", "o", "tag")
    val rules = Seq(
      parse("""RULE <r/b> :- CONSTRUCT { ?x <r> ?y } WHERE { ?x <e> ?y }"""),
      parse("""RULE <r/s> :- CONSTRUCT { ?x <r> ?z } WHERE { ?x <e> ?y . ?y <r> ?z }"""))
    val out = r.materialize(facts, rules)
    val reach = out.filter(col("p") === "r")
    assert(reach.count() == 9) // full closure on the 3-cycle
    // a→c goes a-e-b(0.9), b-r-c(0.8) → 0.8; alternative a..c via cycle is weaker
    val ac = reach.filter(col("s") === "a" && col("o") === "c").collect().head.getDouble(3)
    assert(math.abs(ac - 0.8) < 1e-9)
  }

  test("cross-window: naive ≡ incremental across firings and updates") {
    def run(incremental: Boolean): Seq[Set[(String, String, String)]] = {
      val cw = new CrossWindowReasoner(spark, Seq(congestion), alphaMs = 100,
        incremental = incremental)
      Seq(
        cw.onWindow(content(("r1", "traffic", "high", 10L)), nowMs = 20),
        cw.onWindow(content(("r1", "parking", "full", 30L)), nowMs = 40),
        cw.onWindow(content(("r2", "traffic", "high", 50L)), nowMs = 60),
        cw.onWindow(content(("r1", "traffic", "high", 70L)), nowMs = 80)
      ).map(liveFacts)
    }
    val naive = run(incremental = false)
    val inc = run(incremental = true)
    assert(naive == inc, s"naive $naive vs incremental $inc")
    // congestion derived once both supports live
    assert(naive(1).contains(("r1", "state", "congested")))
  }

  test("distributed close-keyed SDS+ equals the per-step driver reasoner (naive AND incremental)") {
    // the same firing sequence as the naive≡incremental case, plus a
    // static fact, run three ways: driver naive, driver incremental, and
    // ONE distributed materialization over all steps at once
    val firings = Seq(
      (0L, 20L, Seq(("r1", "traffic", "high", 10L))),
      (1L, 40L, Seq(("r1", "parking", "full", 30L))),
      (2L, 60L, Seq(("r2", "traffic", "high", 50L))),
      (3L, 80L, Seq(("r1", "traffic", "high", 70L))))
    val staticDf = Seq(("r1", "district", "d9")).toDF("s", "p", "o")
    def runDriver(incremental: Boolean): Seq[Set[(String, String, String)]] = {
      val cw = new CrossWindowReasoner(spark, Seq(congestion), alphaMs = 100,
        staticFacts = Some(staticDf), incremental = incremental)
      firings.map { case (_, now, rows) => liveFacts(cw.onWindow(content(rows: _*), now)) }
    }
    val naive = runDriver(incremental = false)
    val inc = runDriver(incremental = true)
    assert(naive == inc)

    val steps = firings.map { case (i, now, _) => (i, now) }.toDF("step", "now")
    val contentDf = firings.flatMap { case (i, _, rows) =>
      rows.map { case (s, p, o, et) => (i, s, p, o, et) }
    }.toDF("step", "s", "p", "o", "event_time")
    val dist = CrossWindowDistributed.materializeSteps(steps, contentDf,
      Seq(congestion), alphaMs = 100, staticFacts = Some(staticDf))
    val byStep = dist.collect()
      .map(r => r.getAs[Long]("step") ->
        ((r.getAs[String]("s"), r.getAs[String]("p"), r.getAs[String]("o"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val distSeq = firings.map { case (i, _, _) => byStep.getOrElse(i, Set.empty) }
    assert(distSeq == naive, s"distributed $distSeq vs driver $naive")
    // the derivation actually appears (not an all-empty equality)
    assert(distSeq(1).contains(("r1", "state", "congested")))
  }

  test("distributed SDS+ recursive rule set converges via the checked fixpoint") {
    // a 3-cycle forces the tag-improvement loop (ruleChainDepth = None):
    // full reachability closure with min-across-path, max-across-paths tags
    val rules = Seq(
      parse("""RULE <r/b> :- CONSTRUCT { ?x <r> ?y } WHERE { ?x <e> ?y }"""),
      parse("""RULE <r/s> :- CONSTRUCT { ?x <r> ?z } WHERE { ?x <e> ?y . ?y <r> ?z }"""))
    val steps = Seq((0L, 50L)).toDF("step", "now")
    val contentDf = Seq(
      (0L, "a", "e", "b", 30L), (0L, "b", "e", "c", 20L), (0L, "c", "e", "a", 10L))
      .toDF("step", "s", "p", "o", "event_time")
    val out = CrossWindowDistributed.materializeSteps(steps, contentDf, rules,
      alphaMs = 100)
    val reach = out.filter(col("p") === "r").collect()
      .map(r => (r.getString(1), r.getString(3)) -> r.getDouble(4)).toMap
    assert(reach.size == 9, s"expected the full 3-cycle closure, got ${reach.keySet}")
    // a→c: min(expiry(a→b)=130, expiry(b→c)=120) = 120; longer cycle paths
    // only weaken, so ⊕ max keeps 120
    assert(math.abs(reach(("a", "c")) - 120.0) < 1e-9, s"got ${reach(("a", "c"))}")
  }

  test("expired support no longer derives (rsp_engine_test.rs:977)") {
    val cw = new CrossWindowReasoner(spark, Seq(congestion), alphaMs = 50)
    val f1 = liveFacts(cw.onWindow(content(
      ("r1", "traffic", "high", 10L), ("r1", "parking", "full", 20L)), nowMs = 30))
    assert(f1.contains(("r1", "state", "congested")))
    // traffic support expires at 60; at now=65 only parking (expiry 70) lives
    val f2 = liveFacts(cw.onWindow(content(("r9", "noise", "x", 60L)), nowMs = 65))
    assert(!f2.contains(("r1", "state", "congested")))
    assert(f2.contains(("r1", "parking", "full")))
    assert(!f2.contains(("r1", "traffic", "high")))
  }
}
