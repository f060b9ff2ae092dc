package graft.sparql

import graft.SparkSpec
import graft.sparql.Ast._

/** The bucketed-store star router as a COMPILER heuristic (VERDICT r8
  * item 6): pure subject-star BGPs route to the subject-bucketed quad
  * layout automatically when one is attached; everything else — the
  * multi-hub chains the r8 A/B measured REGRESSING on that layout —
  * provably stays on the plain store. Both directions are pinned on the
  * realized physical scans, not just the detector.
  */
class StarRoutingSpec extends SparkSpec {

  private def bgps(text: String): Seq[Seq[TriplePattern]] = {
    val sel = SparqlParser().parseSelect(text)
    sel.where.collect { case Bgp(ps) => ps }
  }

  test("detector: WatDiv S-slots are pure subject stars, C/F/L are not") {
    val s = graft.queries.WatDivSuite.sparqlText
    for (slot <- Seq("s1", "s2", "s3", "s4", "s5", "s6", "s7")) {
      val ps = bgps(s(s"sparql_watdiv_$slot")).head
      assert(Compiler.isSubjectStar(ps), s"S-slot $slot not detected as a star")
    }
    for (slot <- Seq("c1", "c2", "c3", "f1", "f2", "f3", "l1", "l2", "l3",
        "l4", "l5")) {
      val ps = bgps(s(s"sparql_watdiv_$slot")).head
      assert(!Compiler.isSubjectStar(ps), s"multi-hub $slot detected as a star")
    }
    // fewer than 3 patterns never routes (the exchange saving cannot pay
    // for denying AQE its freedom on a 2-way join)
    val two = bgps("SELECT ?s ?a WHERE { ?s <p> ?a . ?s <q> \"x\" }").head
    assert(!Compiler.isSubjectStar(two))
    // a constant subject is not a star hub
    val const = bgps(
      "SELECT ?a ?b ?c WHERE { <s> <p> ?a . <s> <q> ?b . <s> <r> ?c }").head
    assert(!Compiler.isSubjectStar(const))
  }

  test("routing: with a starStore attached, S1 reads the bucketed table and C3 does not") {
    val plain = graft.relational.Triplizer.cachedStore(spark, sf(), defaultGraph = true)
    val bucketed = graft.relational.Triplizer.bucketedStore(spark, sf(), defaultGraph = true)
    val compiler = new Compiler(plain, starStore = Some(bucketed))
    val s1 = compiler.select(graft.queries.WatDivSuite.sparqlText("sparql_watdiv_s1"))
    s1.count()
    val p1 = s1.queryExecution.executedPlan.toString
    assert(p1.contains("graft_quads_s_"), s"S1 star did not route bucketed:\n$p1")
    // C3 holds the SAME starStore but must stay on the plain parquet path
    // (the measured regression direction)
    val c3 = compiler.select(graft.queries.WatDivSuite.sparqlText("sparql_watdiv_c3"))
    c3.count()
    val p3 = c3.queryExecution.executedPlan.toString
    assert(!p3.contains("graft_quads_s_"), s"C3 multi-hub routed bucketed:\n$p3")
    assert(p3.contains("graft_quads"), s"C3 not reading the plain quad cache:\n$p3")
  }

  test("routing preserves results: S1 rows identical on plain and routed compilers") {
    val plain = graft.relational.Triplizer.cachedStore(spark, sf(), defaultGraph = true)
    val bucketed = graft.relational.Triplizer.bucketedStore(spark, sf(), defaultGraph = true)
    val text = graft.queries.WatDivSuite.sparqlText("sparql_watdiv_s4")
    val a = new Compiler(plain).select(text).collect().toSet
    val b = new Compiler(plain, starStore = Some(bucketed)).select(text).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
