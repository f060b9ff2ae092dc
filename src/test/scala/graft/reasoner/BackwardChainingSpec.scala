package graft.reasoner

import graft.SparkSpec
import graft.sparql.Ast._
import graft.sparql.SparqlParser

/** Backward chaining parity with `backward_chaining.rs:7-206`: goal-
  * directed resolution, recursion, quoted-triple unification. */
class BackwardChainingSpec extends SparkSpec {

  private def parse(r: String) = SparqlParser().parseRule(r)

  private val ancRules = Seq(
    parse("RULE <r/b> :- CONSTRUCT { ?x <anc> ?y } WHERE { ?x <par> ?y }"),
    parse("RULE <r/s> :- CONSTRUCT { ?x <anc> ?z } WHERE { ?x <par> ?y . ?y <anc> ?z }"))

  private val chain = Set(
    ("a", "par", "b"), ("b", "par", "c"), ("c", "par", "d"))

  test("proves base and recursive goals") {
    val bc = new BackwardChainer(chain, ancRules)
    assert(bc.prove(TriplePattern(Lit("a"), Iri("anc"), Lit("b"))))
    assert(bc.prove(TriplePattern(Lit("a"), Iri("anc"), Lit("d"))))
    assert(!bc.prove(TriplePattern(Lit("d"), Iri("anc"), Lit("a"))))
  }

  test("enumerates solutions for open goals") {
    val bc = new BackwardChainer(chain, ancRules)
    val sols = bc.solve(TriplePattern(Lit("a"), Iri("anc"), Var("z")))
      .map(_.get("z")).flatten.toSet
    assert(sols == Set("b", "c", "d"))
  }

  test("sibling subgoals resolved by the same rule stay independent") {
    // pair(?x,?y) :- q(?x), q(?y); q(?a) :- base(?a). Depth-based
    // freshening shared _r1_a across the two sibling q-resolutions and
    // derived only the diagonal (review finding) — expect all 4 pairs.
    val rules = Seq(
      parse("RULE <r/p> :- CONSTRUCT { ?x <pair> ?y } WHERE { ?x <q> <t> . ?y <q> <t> }"),
      parse("RULE <r/q> :- CONSTRUCT { ?a <q> <t> } WHERE { ?a <base> <t> }"))
    val facts = Set(("1", "base", "t"), ("2", "base", "t"))
    val bc = new BackwardChainer(facts, rules)
    val sols = bc.solve(TriplePattern(Var("x"), Iri("pair"), Var("y")))
      .map(s => (s("x"), s("y"))).toSet
    assert(sols == Set(("1", "1"), ("1", "2"), ("2", "1"), ("2", "2")))
  }

  test("unifies quoted-triple goals") {
    val qt = graft.model.TermLex.encodeQuoted("alice", "age", "30")
    val facts = Set((qt, "certainty", "0.9"))
    val bc = new BackwardChainer(facts, Nil)
    val sols = bc.solve(TriplePattern(
      Quoted(Var("s"), Iri("age"), Var("v")), Iri("certainty"), Var("c"))).toSeq
    assert(sols.size == 1)
    assert(sols.head("s") == "alice" && sols.head("v") == "30" && sols.head("c") == "0.9")
  }
}
