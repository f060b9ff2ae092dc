package graft.model

import graft.SparkSpec

/** The QueryEngine facade (`query_engine.rs:15-120`): memory loading,
  * string-rows query results, explain routing, stats. */
class QueryEngineSpec extends SparkSpec {

  test("load, add, query, stats — the reference facade round trip") {
    val e = new QueryEngine(spark)
    e.loadNTriplesToMemory(
      """<http://ex/alice> <http://ex/knows> <http://ex/bob> .
        |<http://ex/bob> <http://ex/knows> <http://ex/carol> .""".stripMargin)
    e.addTripleToMemory("http://ex/carol", "http://ex/knows", "http://ex/dan")
    assert(e.stats.memoryTripleCount == 3)
    val rows = e.query(
      "SELECT ?x ?y WHERE { ?x <http://ex/knows> ?y }").map(_.toList).toSet
    assert(rows == Set(
      List("http://ex/alice", "http://ex/bob"),
      List("http://ex/bob", "http://ex/carol"),
      List("http://ex/carol", "http://ex/dan")))
  }

  test("explain never executes: an UPDATE string leaves the store untouched") {
    val e = new QueryEngine(spark)
    e.addTripleToMemory("a", "p", "b")
    val ex = e.explain("DELETE WHERE { ?s ?p ?o }")
    assert(ex.storageMode == QueryEngine.Static)
    assert(ex.catalystPlan.isEmpty) // routing info only for updates
    assert(e.stats.memoryTripleCount == 1, "explain mutated the store")
  }

  test("explain routes static vs streaming and extracts window clauses") {
    val e = new QueryEngine(spark)
    e.addTripleToMemory("a", "p", "b")
    val static = e.explain("SELECT ?x WHERE { ?x <p> ?y }")
    assert(static.storageMode == QueryEngine.Static && static.usesCatalyst)
    assert(!static.hasWindowing && static.windowClauses.isEmpty)
    assert(static.catalystPlan.exists(_.nonEmpty))

    val rsp = e.explain("""REGISTER RSTREAM <out> AS SELECT *
      FROM NAMED WINDOW :w ON :s [RANGE 10 STEP 2]
      WHERE { WINDOW :w { ?a ?b ?c } }""")
    assert(rsp.storageMode == QueryEngine.Streaming && !rsp.usesCatalyst)
    assert(rsp.hasWindowing && rsp.windowClauses.size == 1)
    assert(rsp.windowClauses.head.contains("[RANGE 10 STEP 2]"))
    assert(rsp.catalystPlan.isEmpty)
  }
}
