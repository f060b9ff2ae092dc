package graft.reasoner

import graft.SparkSpec
import graft.model.QuadStore
import graft.sparql.{Compiler, SparqlParser}

/** Reasoner semantics, mirroring `datalog/tests/reasoning_tests.rs`:
  * naive ≡ semi-naive (the reference's own differential oracle), NAF,
  * deep-chain closure, rule filters. */
class ReasonerSpec extends SparkSpec {

  private def parse(r: String) = SparqlParser().parseRule(r)

  private val anc = Seq(
    parse("RULE <r/base> :- CONSTRUCT { ?x <anc> ?y } WHERE { ?x <par> ?y }"),
    parse("RULE <r/step> :- CONSTRUCT { ?x <anc> ?z } WHERE { ?x <par> ?y . ?y <anc> ?z }"))

  test("transitive closure on a chain; naive ≡ semi-naive") {
    val n = 8
    val chain = (1 to n).map(i => (s"n$i", "par", s"n${i + 1}"))
    val r = new Reasoner(spark)
    val factsDf = QuadStore.fromTriples(spark, chain).quads.select("s", "p", "o")
    val naive = r.materializeNaive(factsDf, anc)
    val semi = r.materializeSemiNaive(factsDf, anc)
    val nSet = naive.collect().map(_.toSeq).toSet
    val sSet = semi.collect().map(_.toSeq).toSet
    assert(nSet == sSet)
    assert(nSet.count(_(1) == "anc") == n * (n + 1) / 2)
  }

  test("diamond + cycle converge") {
    val edges = Seq(("a", "par", "b"), ("a", "par", "c"), ("b", "par", "d"),
      ("c", "par", "d"), ("d", "par", "a")) // cycle back to a
    val r = new Reasoner(spark)
    val facts = QuadStore.fromTriples(spark, edges).quads.select("s", "p", "o")
    val naive = r.materializeNaive(facts, anc)
    val semi = r.materializeSemiNaive(facts, anc)
    assert(naive.collect().map(_.toSeq).toSet == semi.collect().map(_.toSeq).toSet)
    // every node reaches every node through the cycle
    val ancPairs = semi.filter("p = 'anc'").count()
    assert(ancPairs == 16)
  }

  test("stratified negation (NAF) with shared variables") {
    val facts = Seq(("a", "t", "x"), ("b", "t", "x"), ("a", "blocked", "1"))
    val rule = parse(
      """RULE <r/n> :- CONSTRUCT { ?s <ok> "y" } WHERE { ?s <t> ?v . NOT { ?s <blocked> ?b } }""")
    val r = new Reasoner(spark)
    val out = r.materializeSemiNaive(
      QuadStore.fromTriples(spark, facts).quads.select("s", "p", "o"), Seq(rule))
    val ok = out.filter("p = 'ok'").select("s").collect().map(_.getString(0)).toSeq
    assert(ok == Seq("b"))
  }

  test("ground negative premise blocks all derivations when matched") {
    val facts = Seq(("a", "t", "x"), ("sys", "off", "1"))
    val rule = parse(
      """RULE <r/g> :- CONSTRUCT { ?s <ok> "y" } WHERE { ?s <t> ?v . NOT { <sys> <off> ?w } }""")
    val r = new Reasoner(spark)
    val out = r.materializeSemiNaive(
      QuadStore.fromTriples(spark, facts).quads.select("s", "p", "o"), Seq(rule))
    assert(out.filter("p = 'ok'").count() == 0)
  }

  test("rule filters restrict derivations") {
    val facts = Seq(("a", "v", "5"), ("b", "v", "50"))
    val rule = parse(
      """RULE <r/f> :- CONSTRUCT { ?s <big> "y" } WHERE { ?s <v> ?x . FILTER(?x > 10) }""")
    val r = new Reasoner(spark)
    val out = r.materializeSemiNaive(
      QuadStore.fromTriples(spark, facts).quads.select("s", "p", "o"), Seq(rule))
    assert(out.filter("p = 'big'").select("s").collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("materialize into store then query via SPARQL") {
    val st = QuadStore.fromTriples(spark,
      Seq(("a", "par", "b"), ("b", "par", "c"), ("c", "par", "d")))
    new Reasoner(spark).materialize(st, anc)
    val r = new Compiler(st).select("SELECT ?y WHERE { <a> <anc> ?y }")
      .collect().map(_.getString(0)).toSet
    assert(r == Set("b", "c", "d"))
  }

  test("deep taxonomy closure depth 200 via doubling rule (README.md:1057-1068 shape)") {
    // anc(x,z) :- anc(x,y), anc(y,z) doubles path length per round →
    // O(log depth) fixpoint rounds, the shape behind the reference's
    // "logarithmic scaling" claim
    val doubling = Seq(
      parse("RULE <r/base> :- CONSTRUCT { ?x <anc> ?y } WHERE { ?x <par> ?y }"),
      parse("RULE <r/sq> :- CONSTRUCT { ?x <anc> ?z } WHERE { ?x <anc> ?y . ?y <anc> ?z }"))
    val chain = (1 to 200).map(i => (s"c$i", "par", s"c${i + 1}"))
    val facts = QuadStore.fromTriples(spark, chain).quads.select("s", "p", "o")
    val out = new Reasoner(spark).materializeSemiNaive(facts, doubling, maxRounds = 20)
    assert(out.filter("p = 'anc'").count() == 200L * 201 / 2)
  }
}
