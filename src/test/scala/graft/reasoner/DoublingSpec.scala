package graft.reasoner

import graft.SparkSpec
import graft.model.QuadStore
import graft.sparql.Ast._
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential oracle for the recursive-doubling closure strategy: on
  * random graphs (cycles included) the doubling path must produce exactly
  * the facts of the linear semi-naive engine — for the plain set
  * semantics and for the min-max closed semiring — and the strategy must
  * NOT fire when the rule shape or the fact base disqualifies it.
  */
class DoublingSpec extends SparkSpec {

  private def tcRules(stepForm: String): Seq[Rule] = {
    val base = Rule("r/base",
      Seq(TriplePattern(Var("x"), Iri("e"), Var("y"))), Nil, Nil,
      Seq(TriplePattern(Var("x"), Iri("h"), Var("y"))))
    val step = stepForm match {
      case "EH" => Rule("r/step",
        Seq(TriplePattern(Var("x"), Iri("e"), Var("y")),
          TriplePattern(Var("y"), Iri("h"), Var("z"))), Nil, Nil,
        Seq(TriplePattern(Var("x"), Iri("h"), Var("z"))))
      case "HE" => Rule("r/step",
        Seq(TriplePattern(Var("x"), Iri("h"), Var("y")),
          TriplePattern(Var("y"), Iri("e"), Var("z"))), Nil, Nil,
        Seq(TriplePattern(Var("x"), Iri("h"), Var("z"))))
      case "HH" => Rule("r/step",
        Seq(TriplePattern(Var("x"), Iri("h"), Var("y")),
          TriplePattern(Var("y"), Iri("h"), Var("z"))), Nil, Nil,
        Seq(TriplePattern(Var("x"), Iri("h"), Var("z"))))
    }
    Seq(base, step)
  }

  private def randomEdges(seed: Int, n: Int, nodes: Int): Seq[(String, String, String)] = {
    val rnd = new Random(seed)
    (1 to n).map(_ => (s"n${rnd.nextInt(nodes)}", "e", s"n${rnd.nextInt(nodes)}"))
  }

  test("doubling ≡ linear semi-naive for all three step forms, cyclic graphs") {
    for (form <- Seq("EH", "HE", "HH"); seed <- Seq(1, 2)) {
      val df = QuadStore.fromTriples(spark, randomEdges(seed, 12, 6).distinct)
        .quads.select("s", "p", "o")
      val fast = new Reasoner(spark, enableDoubling = true)
        .materializeSemiNaive(df, tcRules(form)).collect().map(_.toSeq).toSet
      val slow = new Reasoner(spark, enableDoubling = false)
        .materializeSemiNaive(df, tcRules(form)).collect().map(_.toSeq).toSet
      assert(fast == slow, s"divergence: form=$form seed=$seed")
    }
  }

  test("shape detection: fires on transitive rules, refuses near-misses") {
    assert(Reasoner.transitiveShape(tcRules("EH")).contains(
      Reasoner.TransitiveShape("e", "h")))
    assert(Reasoner.transitiveShape(tcRules("HE")).isDefined)
    assert(Reasoner.transitiveShape(tcRules("HH")).isDefined)
    // E,E step is bounded two-hop, not closure
    val ee = Seq(tcRules("EH").head, Rule("r/step",
      Seq(TriplePattern(Var("x"), Iri("e"), Var("y")),
        TriplePattern(Var("y"), Iri("e"), Var("z"))), Nil, Nil,
      Seq(TriplePattern(Var("x"), Iri("h"), Var("z")))))
    assert(Reasoner.transitiveShape(ee).isEmpty)
    // a filter disqualifies
    val filtered = tcRules("EH").map(r =>
      r.copy(filters = Seq(Cmp("!=", ETerm(Var("x")), ETerm(Var("z"))))))
    assert(Reasoner.transitiveShape(filtered).isEmpty)
    // repeated variable (reflexive head) disqualifies
    val refl = Seq(tcRules("EH").head, Rule("r/step",
      Seq(TriplePattern(Var("x"), Iri("e"), Var("y")),
        TriplePattern(Var("y"), Iri("h"), Var("x"))), Nil, Nil,
      Seq(TriplePattern(Var("x"), Iri("h"), Var("x")))))
    assert(Reasoner.transitiveShape(refl).isEmpty)
  }

  test("pre-existing head facts force the generic fixpoint") {
    // h(n0,n9) is an extra base fact the closure of e alone would miss;
    // the right-linear fixpoint must prepend e-paths onto it
    val df = QuadStore.fromTriples(spark, Seq(
      ("n0", "e", "n1"), ("n1", "e", "n2"), ("n0", "h", "n9")))
      .quads.select("s", "p", "o")
    val fast = new Reasoner(spark, enableDoubling = true)
      .materializeSemiNaive(df, tcRules("EH")).collect().map(_.toSeq).toSet
    val slow = new Reasoner(spark, enableDoubling = false)
      .materializeSemiNaive(df, tcRules("EH")).collect().map(_.toSeq).toSet
    assert(fast == slow)
    assert(fast.contains(Seq("n0", "h", "n9")))
  }

  private val dtRule = Rule("r/dt",
    Seq(TriplePattern(Var("x"), Iri("type"), Var("c")),
      TriplePattern(Var("c"), Iri("sub"), Var("d"))), Nil, Nil,
    Seq(TriplePattern(Var("x"), Iri("type"), Var("d"))))

  test("type-propagation doubling ≡ linear on random DAGs and diamonds") {
    // deep-taxonomy shape (deep_taxonomy.rs): membership propagation
    // along sub*, evaluated by single-source-set pointer doubling — must
    // equal the generic per-level fixpoint on cyclic random graphs, with
    // multiple individuals and mid-hierarchy declared types
    for (seed <- Seq(5, 6, 7)) {
      val rnd = new Random(seed)
      val subs = (1 to 14).map(_ => (s"c${rnd.nextInt(8)}", "sub", s"c${rnd.nextInt(8)}"))
      val types = (1 to 4).map(i => (s"i$i", "type", s"c${rnd.nextInt(8)}"))
      val df = QuadStore.fromTriples(spark, (subs ++ types).distinct)
        .quads.select("s", "p", "o")
      val fast = new Reasoner(spark, enableDoubling = true)
        .materializeSemiNaive(df, Seq(dtRule)).collect().map(_.toSeq).toSet
      val slow = new Reasoner(spark, enableDoubling = false)
        .materializeSemiNaive(df, Seq(dtRule)).collect().map(_.toSeq).toSet
      assert(fast == slow, s"divergence on seed $seed")
    }
  }

  test("type-propagation shape detection: fires on the DT rule, refuses near-misses") {
    assert(Reasoner.typePropagationShape(Seq(dtRule)).contains(
      Reasoner.TypePropagationShape("type", "sub")))
    // swapped premise order still recognized
    assert(Reasoner.typePropagationShape(Seq(dtRule.copy(
      premise = dtRule.premise.reverse))).isDefined)
    // conclusion through a DIFFERENT predicate is not propagation
    assert(Reasoner.typePropagationShape(Seq(dtRule.copy(
      conclusion = Seq(TriplePattern(Var("x"), Iri("other"), Var("d")))))).isEmpty)
    // same predicate both premises = transitive step, not propagation
    assert(Reasoner.typePropagationShape(Seq(dtRule.copy(
      premise = Seq(TriplePattern(Var("x"), Iri("type"), Var("c")),
        TriplePattern(Var("c"), Iri("type"), Var("d")))))).isEmpty)
    // a filter disqualifies
    assert(Reasoner.typePropagationShape(Seq(dtRule.copy(
      filters = Seq(Cmp("!=", ETerm(Var("x")), ETerm(Var("d"))))))).isEmpty)
    // two rules disqualify (interplay could feed sub)
    assert(Reasoner.typePropagationShape(Seq(dtRule, tcRules("EH").head)).isEmpty)
  }

  test("min-max semiring doubling ≡ linear annotated semi-naive") {
    for (seed <- Seq(3, 4)) {
      val edges = randomEdges(seed, 12, 6).distinct
      val rows = edges.map { case (s, _, o) =>
        (s, "e", o, 0.5 + (math.abs((s + o).hashCode) % 16) / 32.0)
      }
      val df = spark.createDataFrame(rows).toDF("s", "p", "o", "tag")
      val fast = new AnnotatedReasoner(spark, Semiring.minMaxProbability,
        enableDoubling = true).materialize(df, tcRules("EH"))
        .collect().map(_.toSeq).toSet
      val slow = new AnnotatedReasoner(spark, Semiring.minMaxProbability,
        enableDoubling = false).materialize(df, tcRules("EH"))
        .collect().map(_.toSeq).toSet
      assert(fast == slow, s"divergence on seed $seed")
    }
  }
}
