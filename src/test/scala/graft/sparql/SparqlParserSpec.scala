package graft.sparql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

/** Grammar acceptance/rejection, mirroring the reference's
  * `kolibrie/tests/parser_test.rs` coverage areas. */
class SparqlParserSpec extends AnyFunSuite {
  private def sel(q: String) = SparqlParser.select(q)

  test("simple select with prefix") {
    val q = sel("""
      PREFIX foaf: <http://xmlns.com/foaf/0.1/>
      SELECT ?a ?b WHERE { ?a foaf:name ?b }""")
    assert(q.projection == Seq("a", "b"))
    assert(q.where == Seq(Bgp(Seq(TriplePattern(Var("a"),
      Iri("http://xmlns.com/foaf/0.1/name"), Var("b"))))))
  }

  test("semicolon and comma continuations") {
    val q = sel("""SELECT ?s WHERE { ?s <p> "a", "b" ; <q> "c" . }""")
    val pats = q.where.collect { case Bgp(ps) => ps }.flatten
    assert(pats.size == 3)
    assert(pats.map(_.p).distinct == Seq(Iri("p"), Iri("q")))
  }

  test("'a' expands to rdf:type") {
    val q = sel("""SELECT ?s WHERE { ?s a <Person> }""")
    val pats = q.where.collect { case Bgp(ps) => ps }.flatten
    assert(pats.head.p == Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"))
  }

  test("literal cleaning: datatype stripped, lang appended") {
    val q = sel("""SELECT ?s WHERE { ?s <p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> . ?s <q> "hi"@en }""")
    val pats = q.where.collect { case Bgp(ps) => ps }.flatten
    assert(pats.map(_.o) == Seq(Lit("5"), Lit("hi@en")))
  }

  test("aggregates including COUNT (reference parser gap, SURVEY §7.5)") {
    val q = sel("""
      SELECT ?g (COUNT(*) AS ?n) (SUM(?x) AS ?sx) (AVG(?x) AS ?ax)
             (MIN(?x) AS ?mn) (MAX(?x) AS ?mx)
      WHERE { ?g <p> ?x } GROUP BY ?g""")
    assert(q.aggregates.map(_.func) == Seq("COUNT", "SUM", "AVG", "MIN", "MAX"))
    assert(q.aggregates.head.v.isEmpty)
    assert(q.groupBy == Seq("g"))
  }

  test("order by / limit / offset / distinct") {
    val q = sel("""SELECT DISTINCT ?a WHERE { ?a <p> ?b } ORDER BY DESC(?b) ?a LIMIT 5 OFFSET 2""")
    assert(q.distinct && q.limit.contains(5) && q.offset.contains(2))
    assert(q.orderBy == Seq(OrderKey("b", asc = false), OrderKey("a", asc = true)))
  }

  test("union, graph, values, bind, filter, subselect") {
    val q = sel("""
      SELECT ?s WHERE {
        { ?s <p> ?x } UNION { ?s <q> ?x }
        GRAPH ?g { ?s <r> ?y }
        VALUES (?x) { ("1") (UNDEF) }
        BIND(CONCAT(?x, "-", ?y) AS ?z)
        FILTER(?x > 3 && !(?y = "a" || isTRIPLE(?s)))
        { SELECT ?s (MAX(?w) AS ?mw) WHERE { ?s <t> ?w } GROUP BY ?s }
      }""")
    assert(q.where.count(_.isInstanceOf[UnionBlock]) == 1)
    assert(q.where.count(_.isInstanceOf[GraphBlock]) == 1)
    assert(q.where.count(_.isInstanceOf[ValuesElem]) == 1)
    assert(q.where.count(_.isInstanceOf[BindElem]) == 1)
    assert(q.where.count(_.isInstanceOf[FilterElem]) == 1)
    assert(q.where.count(_.isInstanceOf[SubSelect]) == 1)
  }

  test("quoted triple terms nest") {
    val q = sel("""SELECT ?x WHERE { << ?s <p> << <a> <b> <c> >> >> <said> ?x }""")
    val pats = q.where.collect { case Bgp(ps) => ps }.flatten
    pats.head.s match {
      case Quoted(Var("s"), Iri("p"), Quoted(Iri("a"), Iri("b"), Iri("c"))) =>
      case other => fail(s"unexpected: $other")
    }
  }

  test("from / from named") {
    val q = sel("""SELECT ?s FROM <g1> FROM NAMED <g2> WHERE { ?s <p> ?o }""")
    assert(q.fromGraphs == Seq("g1") && q.fromNamed == Seq("g2"))
  }

  test("update forms parse") {
    val p = SparqlParser()
    assert(p.parseUpdate("""INSERT DATA { <a> <b> <c> . GRAPH <g> { <d> <e> <f> } }""")
      .isInstanceOf[InsertData])
    assert(p.parseUpdate("""DELETE DATA { <a> <b> <c> }""").isInstanceOf[DeleteData])
    val m = p.parseUpdate("""DELETE { ?s <p> ?o } INSERT { ?s <q> ?o } WHERE { ?s <p> ?o }""")
    assert(m.asInstanceOf[Modify].deleteTemplate.nonEmpty)
    assert(m.asInstanceOf[Modify].insertTemplate.nonEmpty)
    val dw = p.parseUpdate("""DELETE WHERE { ?s <p> ?o }""").asInstanceOf[Modify]
    assert(dw.deleteTemplate.nonEmpty && dw.insertTemplate.isEmpty)
  }

  test("rule definition with NOT and FILTER") {
    val r = SparqlParser().parseRule("""
      RULE <rules/r1> :- CONSTRUCT { ?x <anc> ?z }
      WHERE { ?x <par> ?y . ?y <anc> ?z . NOT { ?x <blocked> ?z } FILTER(?x != ?z) }""")
    assert(r.premise.size == 2 && r.negativePremise.size == 1 && r.filters.size == 1)
    assert(r.conclusion.size == 1)
  }

  test("rsp-ql register query") {
    val q = SparqlParser().parseRsp("""
      REGISTER ISTREAM <out> AS
      SELECT ?t (COUNT(*) AS ?n)
      FROM NAMED WINDOW <w1> ON <stream1> [RANGE 10 s STEP 5 s]
      WHERE { WINDOW <w1> { ?s <type> ?t } }
      GROUP BY ?t""")
    assert(q.kind == IStream)
    assert(q.windows == Seq(WindowSpec("w1", "stream1", 10000, 5000)))
  }

  test("window bracket accepts the full reference surface: TUMBLING/SLIDING, REPORT, TICK (parser.rs:2594-2664)") {
    // TUMBLING without STEP: slide defaults to width (rsp/builder.rs:247-250)
    val t = SparqlParser().parseRsp("""
      REGISTER RSTREAM <out> AS SELECT ?s
      FROM NAMED WINDOW <w> ON <st> [TUMBLING 10 s]
      WHERE { WINDOW <w> { ?s <p> ?o } }""")
    assert(t.windows.head.rangeMs == 10000 && t.windows.head.stepMs == 10000)
    // SLIDING + STEP + REPORT + TICK all inside one bracket
    val f = SparqlParser().parseRsp("""
      REGISTER ISTREAM <out> AS SELECT ?s
      FROM NAMED WINDOW <w> ON <st> [SLIDING 10 s STEP 5 s REPORT NON_EMPTY_CONTENT TICK TIME_DRIVEN]
      WHERE { WINDOW <w> { ?s <p> ?o } }""")
    val w = f.windows.head
    assert(w.rangeMs == 10000 && w.stepMs == 5000)
    assert(w.report.contains("NON_EMPTY_CONTENT") && w.tick.contains("TIME_DRIVEN"))
    // the non-executing ticks PARSE (reference parity) — refusal is the
    // engine's job, with the typed unsupported category
    val b = SparqlParser().parseRsp("""
      REGISTER RSTREAM <out> AS SELECT ?s
      FROM NAMED WINDOW <w> ON <st> [RANGE 10 s TICK BATCH_DRIVEN]
      WHERE { WINDOW <w> { ?s <p> ?o } }""")
    assert(b.windows.head.tick.contains("BATCH_DRIVEN"))
  }

  test("review regressions: bare-second RANGE/STEP, lowercase HAVING agg, default prefix, 'a:' prefix") {
    // `[RANGE 10 STEP 5]` — the unit parser must not eat STEP's 'S'
    val q = SparqlParser().parseRsp("""
      REGISTER RSTREAM <out> AS SELECT ?s
      FROM NAMED WINDOW <w> ON <st> [RANGE 10 STEP 5]
      WHERE { WINDOW <w> { ?s <p> ?o } }""")
    assert(q.windows.head.rangeMs == 10000 && q.windows.head.stepMs == 5000)
    // lowercase aggregate inside HAVING normalizes like every other keyword
    val h = SparqlParser.select(
      "SELECT ?u (count(?e) AS ?n) WHERE { ?u <p> ?e } GROUP BY ?u HAVING(count(?e) >= 2)")
    assert(h.having.nonEmpty)
    // default prefix declaration + use
    val d = SparqlParser.select(
      "PREFIX : <http://ex/> SELECT ?s WHERE { ?s :p :o }")
    assert(d.where.collect { case Bgp(tps) => tps }.flatten.head.p ==
      Iri("http://ex/p"))
    // a prefix named 'a:' is a prefixed name, not the rdf:type keyword
    val a = SparqlParser.select(
      "PREFIX a: <http://ex/> SELECT ?s WHERE { ?s a:p a:o }")
    assert(a.where.collect { case Bgp(tps) => tps }.flatten.head.p ==
      Iri("http://ex/p"))
    // bare 'a' keyword still means rdf:type
    val t = SparqlParser.select("SELECT ?s WHERE { ?s a <C> }")
    assert(t.where.collect { case Bgp(tps) => tps }.flatten.head.p ==
      Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"))
  }

  test("rejects malformed queries") {
    val bad = Seq(
      "SELECT WHERE { ?s <p> ?o }",          // no projection
      "SELECT ?s { ?s <p> ?o }",             // missing WHERE
      "SELECT ?s WHERE { ?s <p> }",          // incomplete triple
      "SELECT ?s WHERE { ?s <p> ?o ")        // unclosed group
    bad.foreach { q =>
      assertThrows[IllegalArgumentException](SparqlParser.select(q))
    }
  }
}
