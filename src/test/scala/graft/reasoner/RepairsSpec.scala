package graft.reasoner

import graft.SparkSpec
import graft.model.QuadStore
import graft.sparql.Ast._
import graft.sparql.SparqlParser

/** Constraints & repairs semantics, mirroring the reference's
  * contradictions walkthrough (`kolibrie/examples/sparql_syntax/
  * knowledge_graph/contradictions.rs`) and the repairs machinery in
  * `datalog/src/reasoning.rs:131-186` / `reasoning/repairs.rs`. */
class RepairsSpec extends SparkSpec {

  private val constraint = SparqlParser().parseRule(
    """RULE <c/not-both> :- CONSTRUCT { <x> <x> <x> }
       WHERE { ?x <isA> "professor" . ?x <isA> "student" }""")

  private val johnFacts: Set[Repairs.Fact] = Set(
    ("john", "isA", "professor"),
    ("john", "isA", "student"),
    ("john", "teaches", "math101"),
    ("john", "enrolledIn", "physics101"))

  test("violates detects constraint matches") {
    assert(Repairs.violates(Seq(constraint), johnFacts))
    assert(!Repairs.violates(Seq(constraint), johnFacts - (("john", "isA", "student"))))
  }

  test("compute_repairs finds the two maximal consistent subsets") {
    val repairs = Repairs.computeRepairs(Seq(constraint), johnFacts)
    assert(repairs.size == 2)
    assert(repairs.forall(_.size == 3))
    val removed = repairs.map(johnFacts -- _).toSet
    assert(removed == Set(
      Set[Repairs.Fact](("john", "isA", "professor")),
      Set[Repairs.Fact](("john", "isA", "student"))))
  }

  test("IAR query returns only answers present in every repair (repairs.rs:10-45)") {
    // john's role differs across repairs → no certain answer
    val roles = Repairs.queryWithRepairs(Seq(constraint), johnFacts,
      TriplePattern(Iri("john"), Iri("isA"), Var("Role")))
    assert(roles.isEmpty)
    // teaches survives every repair → certain
    val teaches = Repairs.queryWithRepairs(Seq(constraint), johnFacts,
      TriplePattern(Iri("john"), Iri("teaches"), Var("C")))
    assert(teaches == Seq(Map("C" -> "math101")))
  }

  test("infer with repairs skips conclusions that would violate (semi_naive_with_repairs.rs)") {
    val professorRule = SparqlParser().parseRule(
      """RULE <r/prof> :- CONSTRUCT { ?x <isA> "professor" }
         WHERE { ?x <teaches> ?y }""")
    val studentRule = SparqlParser().parseRule(
      """RULE <r/stud> :- CONSTRUCT { ?x <isA> "student" }
         WHERE { ?x <enrolledIn> ?y }""")
    val seeds: Set[Repairs.Fact] = Set(
      ("john", "teaches", "math101"), ("john", "enrolledIn", "physics101"))
    val (facts, inferred) = Repairs.inferWithRepairs(
      Seq(professorRule, studentRule), Seq(constraint), seeds)
    // exactly one of the two contradictory conclusions lands (sorted
    // application order → "professor" < "student" lexically)
    assert(facts.contains(("john", "isA", "professor")))
    assert(!facts.contains(("john", "isA", "student")))
    assert(inferred == Seq(("john", "isA", "professor")))
  }

  test("inconsistent seeds are replaced by the largest repair before inference") {
    val extra = johnFacts + (("mary", "isA", "professor"))
    val (facts, _) = Repairs.inferWithRepairs(Nil, Seq(constraint), extra)
    assert(!Repairs.violates(Seq(constraint), facts))
    assert(facts.size == 4) // one of john's roles dropped, mary kept
    assert(facts.contains(("mary", "isA", "professor")))
  }

  test("store wrappers: repair-materialize then IAR-query end-to-end") {
    val store = QuadStore.fromTriples(spark, Seq(
      ("john", "teaches", "math101"), ("john", "enrolledIn", "physics101")))
    val professorRule = SparqlParser().parseRule(
      """RULE <r/prof> :- CONSTRUCT { ?x <isA> "professor" }
         WHERE { ?x <teaches> ?y }""")
    val studentRule = SparqlParser().parseRule(
      """RULE <r/stud> :- CONSTRUCT { ?x <isA> "student" }
         WHERE { ?x <enrolledIn> ?y }""")
    val inferred = Repairs.materializeStore(store,
      Seq(professorRule, studentRule), Seq(constraint))
    assert(inferred == Seq(("john", "isA", "professor")))
    val ans = Repairs.queryStore(store, Seq(constraint),
      TriplePattern(Iri("john"), Iri("isA"), Var("Role")))
    assert(ans == Seq(Map("Role" -> "professor")))
  }
}
