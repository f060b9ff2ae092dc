package graft.reasoner

import graft.SparkSpec
import graft.model.QuadStore
import graft.sparql.Ast._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based differential oracle (SURVEY §5c): for random safe
  * Datalog programs over a small vocabulary, naive and semi-naive
  * materialization produce identical fact sets — mirroring the
  * reference's own naive-vs-semi-naive equivalence tests
  * (`datalog/tests/reasoning_tests.rs`). Uses ScalaCheck generators with
  * fixed seeds (deterministic; each sample costs several Spark jobs).
  */
class ReasonerPropertySpec extends SparkSpec {

  private val consts = Gen.oneOf("c0", "c1", "c2", "c3")
  private val basePreds = Gen.oneOf("p0", "p1")
  private val vars = Seq(Var("x"), Var("y"), Var("z"))

  private val factGen: Gen[(String, String, String)] = for {
    s <- consts; p <- basePreds; o <- consts
  } yield (s, p, o)

  /** A safe rule: head vars ⊆ body vars; chain-shaped body of 1–2
    * patterns over base or derived predicates (recursion allowed). */
  private val ruleGen: Gen[Rule] = for {
    headPred <- Gen.oneOf("d0", "d1")
    nBody <- Gen.choose(1, 2)
    bodyPreds <- Gen.listOfN(nBody, Gen.oneOf("p0", "p1", "d0"))
  } yield {
    val premise = bodyPreds.zipWithIndex.map { case (p, i) =>
      TriplePattern(vars(i), Iri(p), vars(i + 1))
    }
    val headO = if (nBody == 2) Var("z") else Var("y")
    Rule(s"r/$headPred", premise, Nil, Nil,
      Seq(TriplePattern(Var("x"), Iri(headPred), headO)))
  }

  private val programGen: Gen[(List[(String, String, String)], List[Rule])] = for {
    nf <- Gen.choose(3, 10)
    facts <- Gen.listOfN(nf, factGen)
    nr <- Gen.choose(1, 3)
    rules <- Gen.listOfN(nr, ruleGen)
  } yield (facts, rules)

  test("naive ≡ semi-naive on random safe programs") {
    (1 to 6).foreach { i =>
      val (facts, rules) =
        programGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val df = QuadStore.fromTriples(spark, facts.distinct).quads.select("s", "p", "o")
      val r = new Reasoner(spark)
      val naive = r.materializeNaive(df, rules, maxRounds = 20)
        .collect().map(_.toSeq).toSet
      val semi = r.materializeSemiNaive(df, rules, maxRounds = 20)
        .collect().map(_.toSeq).toSet
      assert(naive == semi,
        s"divergence on seed $i: facts=$facts rules=${rules.map(_.name)}")
    }
  }
}
