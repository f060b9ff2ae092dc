package graft.reasoner

import graft.SparkSpec
import graft.sparql.Ast._
import Hierarchy._

/** Hierarchical multi-level reasoning semantics, mirroring the
  * reference's `hierarchy_reasoning.rs` example and the
  * `reasoning_experimental.rs` behaviors: per-level isolation,
  * cross-level rules reading dependency levels, the two-premise
  * fact-identity guard, level-ranked certainty. */
class HierarchySpec extends SparkSpec {

  private def tp(s: Term, p: Term, o: Term) = TriplePattern(s, p, o)
  private def rule(premise: Seq[TriplePattern], conclusion: Seq[TriplePattern]) =
    Rule("r", premise, Nil, Nil, conclusion)

  test("reference example: mortality within-level, hypothesis cross-level") {
    val h = new ReasoningHierarchy(spark)
    h.addFactAtLevel(Base, "socrates", "is_a", "man")
    h.addFactAtLevel(Base, "plato", "is_a", "man")

    // cross-level: Base facts feed the Deductive conclusion
    h.addCrossLevelRule(HierarchicalRule(
      rule(Seq(tp(Var("x"), Iri("is_a"), Iri("man"))),
        Seq(tp(Var("x"), Iri("is"), Iri("mortal")))),
      level = Deductive, priority = 1, dependencies = Seq(Base)))

    // cross-level: Deductive conclusions feed an Abductive hypothesis
    // (the example's hypothesis_rule, reasoning_experimental.rs deps)
    h.addCrossLevelRule(HierarchicalRule(
      rule(Seq(tp(Var("x"), Iri("is"), Iri("mortal"))),
        Seq(tp(Var("x"), Iri("might_have"), Iri("soul")))),
      level = Abductive, priority = 1, dependencies = Seq(Deductive)))

    val inferred = h.hierarchicalInference()
    val deductive = inferred(Deductive).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(deductive == Set(("socrates", "is", "mortal"), ("plato", "is", "mortal")))
    val abductive = inferred(Abductive).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(abductive == Set(("socrates", "might_have", "soul"),
      ("plato", "might_have", "soul")))

    // certainty degrades with the level the fact first appears at
    assert(h.factCertainty("socrates", "is_a", "man") == 1.0)
    assert(h.factCertainty("socrates", "is", "mortal") == 0.9)
    assert(h.factCertainty("socrates", "might_have", "soul") == 0.6)
    assert(h.factCertainty("socrates", "is", "immortal") == 0.0)

    // query the whole hierarchy / one level, with constants
    val all = h.queryHierarchy(s = Some("socrates"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(all == Set(("base", "is_a"), ("deductive", "is"), ("abductive", "might_have")))
    assert(h.queryHierarchy(level = Some(Abductive)).count() == 2)
  }

  test("within-level rules saturate via semi-naive and see only their level") {
    val h = new ReasoningHierarchy(spark)
    h.addFactsAtLevel(Deductive, Seq(("a", "sub", "b"), ("b", "sub", "c"), ("c", "sub", "d")))
    // also a Base fact the Deductive rule must NOT see
    h.addFactAtLevel(Base, "x", "sub", "y")
    h.addRuleAtLevel(Deductive,
      rule(Seq(tp(Var("x"), Iri("sub"), Var("y")), tp(Var("y"), Iri("sub"), Var("z"))),
        Seq(tp(Var("x"), Iri("sub"), Var("z")))), priority = 1)
    val inferred = h.hierarchicalInference()(Deductive).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(inferred == Set(("a", "c"), ("a", "d"), ("b", "d")))
    // base level untouched; the deductive closure never saw (x, sub, y)
    assert(!inferred.exists(_._1 == "x"))
    assert(h.factsAt(Base).count() == 1)
  }

  test("cross-level two-premise rule enforces the fact-identity guard") {
    val h = new ReasoningHierarchy(spark)
    // a self-loop alone WOULD satisfy both premises with the same fact —
    // the reference's i != j guard rejects exactly that
    h.addFactAtLevel(Base, "solo", "knows", "solo")
    h.addFactAtLevel(Base, "a", "knows", "b")
    h.addFactAtLevel(Base, "b", "knows", "c")
    h.addCrossLevelRule(HierarchicalRule(
      rule(Seq(tp(Var("x"), Iri("knows"), Var("y")), tp(Var("y"), Iri("knows"), Var("z"))),
        Seq(tp(Var("x"), Iri("related"), Var("z")))),
      level = Abductive, priority = 0, dependencies = Seq(Base)))
    val got = h.hierarchicalInference()(Abductive).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(got == Set(("a", "c")), s"got $got")

    // arity > 2 is refused loudly, as in the reference
    val h2 = new ReasoningHierarchy(spark)
    h2.addFactAtLevel(Base, "a", "p", "b")
    h2.addCrossLevelRule(HierarchicalRule(
      rule(Seq(tp(Var("x"), Iri("p"), Var("y")), tp(Var("y"), Iri("p"), Var("z")),
          tp(Var("z"), Iri("p"), Var("w"))),
        Seq(tp(Var("x"), Iri("q"), Var("w")))),
      level = Deductive, priority = 0, dependencies = Seq(Base)))
    val ex = intercept[IllegalArgumentException](h2.hierarchicalInference())
    assert(ex.getMessage.contains("premise length"))
  }

  test("cross-level rules pool facts from ALL declared dependency levels") {
    val h = new ReasoningHierarchy(spark)
    h.addFactAtLevel(Base, "a", "obs", "x")
    h.addFactAtLevel(Deductive, "x", "implies", "y")
    h.addCrossLevelRule(HierarchicalRule(
      rule(Seq(tp(Var("s"), Iri("obs"), Var("m")), tp(Var("m"), Iri("implies"), Var("t"))),
        Seq(tp(Var("s"), Iri("suggests"), Var("t")))),
      level = MetaReasoning, priority = 0, dependencies = Seq(Base, Deductive)))
    val got = h.hierarchicalInference()(MetaReasoning).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", "suggests", "y")))
    assert(h.factCertainty("a", "suggests", "y") == 0.4)
  }
}
