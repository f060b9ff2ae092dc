package graft.reasoner

import graft.SparkSpec
import graft.sparql.Ast._
import org.apache.spark.sql.functions._

/** Negation-aware provenance semantics, mirroring the reference's
  * negative-stratum pass (`datalog/src/reasoning/materialisation/
  * provenance_semi_naive.rs:240-385`): a present negated fact contributes
  * ⊖(its tag), an absent one contributes ⊤, strata evaluate
  * positive-then-negative, zero-tag conclusions are dropped.
  */
class NegationProvenanceSpec extends SparkSpec {

  private def tagged(rows: Seq[(String, String, String, Double)]) =
    spark.createDataFrame(rows).toDF("s", "p", "o", "tag")

  private val safeRule = Rule("r/safe",
    Seq(TriplePattern(Var("x"), Iri("node"), Lit("true"))),
    Seq(TriplePattern(Var("x"), Iri("risky"), Lit("true"))),
    Nil,
    Seq(TriplePattern(Var("x"), Iri("safe"), Lit("true"))))

  test("present negated fact contributes 1−p; absent contributes 1") {
    val r = new AnnotatedReasoner(spark, Semiring.minMaxProbability)
    val facts = tagged(Seq(
      ("a", "node", "true", 0.9),
      ("b", "node", "true", 0.8),
      ("a", "risky", "true", 0.25)))
    val out = r.materializeStratified(facts, Seq(safeRule))
      .filter(col("p") === "safe").collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    // a: min(0.9, 1−0.25) = 0.75 ; b: min(0.8, 1) = 0.8
    assert(out == Map("a" -> 0.75, "b" -> 0.8))
  }

  test("stratification: negated atoms see stratum-0 derivations") {
    val derive = Rule("r/risky",
      Seq(TriplePattern(Var("x"), Iri("flagged"), Lit("true"))), Nil, Nil,
      Seq(TriplePattern(Var("x"), Iri("risky"), Lit("true"))))
    val r = new AnnotatedReasoner(spark, Semiring.minMaxProbability)
    val facts = tagged(Seq(
      ("a", "node", "true", 0.9),
      ("a", "flagged", "true", 0.5)))
    val out = r.materializeStratified(facts, Seq(safeRule, derive))
      .filter(col("p") === "safe").collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    // risky(a) is DERIVED (tag 0.5) before the negative pass runs
    assert(out == Map("a" -> 0.5))
  }

  test("ground negated atom gates every binding") {
    val gated = Rule("r/gated",
      Seq(TriplePattern(Var("x"), Iri("node"), Lit("true"))),
      Seq(TriplePattern(Iri("sys"), Iri("down"), Lit("true"))),
      Nil,
      Seq(TriplePattern(Var("x"), Iri("ok"), Lit("true"))))
    val r = new AnnotatedReasoner(spark, Semiring.minMaxProbability)
    val facts = tagged(Seq(
      ("a", "node", "true", 0.9),
      ("sys", "down", "true", 0.375)))
    val out = r.materializeStratified(facts, Seq(gated))
      .filter(col("p") === "ok").collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(out == Map("a" -> math.min(0.9, 1 - 0.375)))
  }

  test("zero-tag conclusions are dropped; unbound negated var refuses") {
    val r = new AnnotatedReasoner(spark, Semiring.minMaxProbability)
    val facts = tagged(Seq(
      ("a", "node", "true", 0.9),
      ("a", "risky", "true", 1.0))) // ⊖ 1.0 = 0 → conclusion dropped
    val out = r.materializeStratified(facts, Seq(safeRule))
      .filter(col("p") === "safe").collect()
    assert(out.isEmpty)

    val unsafe = Rule("r/unsafe",
      Seq(TriplePattern(Var("x"), Iri("node"), Lit("true"))),
      Seq(TriplePattern(Var("y"), Iri("risky"), Lit("true"))), // y unbound
      Nil,
      Seq(TriplePattern(Var("x"), Iri("bad"), Lit("true"))))
    intercept[IllegalArgumentException] {
      r.materializeStratified(facts, Seq(unsafe)).collect()
    }
  }

  test("proofs semiring: stratified NAF yields correlation-aware lineage") {
    // risky(x) ← member(x) ∧ signal(x); safe(x) ← member(x) ∧ ¬risky(x).
    // The lineage of safe is m ⊗ ⊖(m∧s) = (m∧¬m) ∨ (m∧¬s) = m∧¬s, so the
    // exact value is pm·(1−ps) — NOT the independence-assuming
    // pm·(1−pm·ps) a scalar noisy-or would produce. This is the case
    // only signed-literal provenance gets right (provenance.rs:322-420).
    val riskyRule = Rule("r/risky",
      Seq(TriplePattern(Var("x"), Iri("member"), Lit("true")),
        TriplePattern(Var("x"), Iri("signal"), Lit("true"))), Nil, Nil,
      Seq(TriplePattern(Var("x"), Iri("risky"), Lit("true"))))
    val safeNaf = Rule("r/safe",
      Seq(TriplePattern(Var("x"), Iri("member"), Lit("true"))),
      Seq(TriplePattern(Var("x"), Iri("risky"), Lit("true"))), Nil,
      Seq(TriplePattern(Var("x"), Iri("safe"), Lit("true"))))
    val seeds = spark.createDataFrame(Seq(
      ("a", "member", "true", 0.75), ("a", "signal", "true", 0.5),
      ("b", "member", "true", 0.625)))
      .toDF("s", "p", "o", "prob")
    val out = graft.prob.ProbReasoner
      .wmcMaterialize(spark, seeds, Seq(riskyRule, safeNaf))
      .filter(org.apache.spark.sql.functions.col("p") === "safe").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("value"), r.getAs[String]("status"), r.getAs[String]("formula")))
      .toMap
    assert(out("a")._1 == 0.75 * 0.5) // pm(1−ps), correlation-aware
    assert(out("a")._2 == "Exact")
    assert(out("a")._3.contains("¬"))
    assert(out("b")._1 == 0.625) // no risky evidence → ⊤ contribution
  }
}
