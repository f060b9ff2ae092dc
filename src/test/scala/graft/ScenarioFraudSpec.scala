package graft

import graft.model.QuadStore
import graft.sparql.{Compiler, SparqlParser}
import graft.streaming.{RspEngine, RspEngineBuilder}
import graft.mlx.{MlRuntime, Mlp, ModelSpec, NeuralRelationSpec}

/** Condensed end-to-end parity with the reference's flagship example
  * (`kolibrie/examples/real_scenario/fraud_detection_system.rs`): an
  * RSP window over a transaction stream, pass-1 symbolic rules flagging
  * raw features, ML scoring written back as facts, a pass-2 rule over
  * the ML verdict, and a final aggregated alert query — the full
  * neuro-symbolic loop a reference user runs, on graft's engine.
  *
  * Transactions (amount, velocity1h, merchantRisk, isForeign):
  * tx1 (1500, 7, 80, 1) — all pass-1 flags + high risk + ML fraud;
  * tx2 (100, 1, 10, 0) — clean; tx3 (2000, 2, 20, 0) — large amount
  * only; tx4 (500, 6, 75, 1) — velocity/merchant/foreign flags, ML ok.
  */
class ScenarioFraudSpec extends SparkSpec {

  private val ex = "http://fraud.example.org/"
  private val txs = Seq(
    ("tx1", 1500, 7, 80, 1),
    ("tx2", 100, 1, 10, 0),
    ("tx3", 2000, 2, 20, 0),
    ("tx4", 500, 6, 75, 1))

  private def txTriples: Seq[(String, String, String)] = txs.flatMap {
    case (id, amt, vel, mr, isF) => Seq(
      (ex + id, ex + "amount", amt.toString),
      (ex + id, ex + "velocity1h", vel.toString),
      (ex + id, ex + "merchantRisk", mr.toString),
      (ex + id, ex + "isForeign", isF.toString))
  }

  // the reference's pass-1 rule set (fraud_detection_system.rs:677-757),
  // same constants, graft RULE syntax
  private val pass1 = Seq(
    s"""RULE <r/vel> :- CONSTRUCT { ?tx <${ex}suspiciousFlag> <${ex}highVelocity> }
        WHERE { ?tx <${ex}velocity1h> ?vel . FILTER(?vel > 5) }""",
    s"""RULE <r/amt> :- CONSTRUCT { ?tx <${ex}suspiciousFlag> <${ex}largeAmount> }
        WHERE { ?tx <${ex}amount> ?amt . FILTER(?amt > 1000) }""",
    s"""RULE <r/mr> :- CONSTRUCT { ?tx <${ex}suspiciousFlag> <${ex}highMerchantRisk> }
        WHERE { ?tx <${ex}merchantRisk> ?mr . FILTER(?mr > 70) }""",
    s"""RULE <r/for> :- CONSTRUCT { ?tx <${ex}suspiciousFlag> <${ex}foreignHighRisk> }
        WHERE { ?tx <${ex}isForeign> ?isF . ?tx <${ex}merchantRisk> ?mr .
                FILTER(?isF > 0) FILTER(?mr > 70) }""",
    s"""RULE <r/high> :- CONSTRUCT { ?tx <${ex}riskLevel> <${ex}high> }
        WHERE { ?tx <${ex}amount> ?amt . ?tx <${ex}velocity1h> ?vel .
                FILTER(?amt > 1000) FILTER(?vel > 5) }""")

  private def materialize(st: QuadStore, rules: Seq[String]): Unit =
    new graft.reasoner.Reasoner(spark).materialize(
      st, rules.map(new SparqlParser().parseRule))

  test("RSP window streams the transaction snapshot (RANGE 300 STEP 60)") {
    val e = RspEngineBuilder.fromQuery(spark, s"""
      REGISTER RSTREAM <${ex}out/transactions> AS
      SELECT *
      FROM NAMED WINDOW :txWindow ON :transactionStream [RANGE 300 ms STEP 60 ms]
      WHERE { WINDOW :txWindow {
        ?txId <${ex}amount> ?amount .
        ?txId <${ex}velocity1h> ?vel .
      } }""")
    txs.zipWithIndex.foreach { case ((id, amt, vel, _, _), i) =>
      val ts = 10L + i * 60L
      e.add("transactionStream", ex + id, ex + "amount", amt.toString, ts)
      e.add("transactionStream", ex + id, ex + "velocity1h", vel.toString, ts)
    }
    // TimeDriven tick: a firing happens when event time ADVANCES, so the
    // last transaction's full pattern is only visible to a firing after
    // it — stream a heartbeat past it, as the reference's continuous
    // simulation implicitly does
    e.add("transactionStream", ex + "heartbeat", ex + "tick", "1", 250L)
    val last = e.emissions.last.rows
    // the RANGE 300 window still covers every transaction at the final
    // firing: the full snapshot streams out with both features bound
    assert(last.map(_("txId")).toSet == txs.map(t => ex + t._1).toSet)
    val amounts = last.map(r => r("txId") -> r("amount")).toMap
    assert(amounts(ex + "tx1") == "1500" && amounts(ex + "tx3") == "2000")
  }

  test("pass-1 symbolic rules derive the reference's flags") {
    val st = QuadStore.fromTriples(spark, txTriples)
    materialize(st, pass1)
    val flags = new Compiler(st)
      .select(s"SELECT ?tx ?f WHERE { ?tx <${ex}suspiciousFlag> ?f }")
      .collect().map(r => (r.getString(0).stripPrefix(ex),
        r.getString(1).stripPrefix(ex)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(flags("tx1") == Set("highVelocity", "largeAmount",
      "highMerchantRisk", "foreignHighRisk"))
    assert(!flags.contains("tx2"))
    assert(flags("tx3") == Set("largeAmount"))
    assert(flags("tx4") == Set("highVelocity", "highMerchantRisk",
      "foreignHighRisk"))
    // chained high-risk rule: amount AND velocity (tx1 only)
    val risk = new Compiler(st)
      .select(s"SELECT ?tx WHERE { ?tx <${ex}riskLevel> <${ex}high> }")
      .collect().map(_.getString(0).stripPrefix(ex)).toSet
    assert(risk == Set("tx1"))
  }

  test("ML scoring writes facts; the pass-2 rule alerts on verdict + velocity") {
    val st = QuadStore.fromTriples(spark, txTriples)
    materialize(st, pass1)
    // fraud_predictor as a fixed-weight model over (amount, velocity):
    // sigmoid(0.001·amt + 0.5·vel − 4) > 0.5 ⇔ amt/1000 + vel/2 > 4
    // → tx1 (1.5 + 3.5) fraud; tx2/tx3/tx4 below the boundary
    val rt = new MlRuntime(spark)
    rt.declareModel(ModelSpec("fraud_predictor", Nil, Seq("fraud"), binary = true))
    rt.setWeights("fraud_predictor",
      Mlp(Array(Array(Array(0.001, 0.5, -4.0))), Seq("fraud"), binary = true))
    rt.declareNeuralRelation(NeuralRelationSpec(
      ex + "mlFraudLevel", "fraud_predictor",
      s"SELECT ?tx ?amt ?vel WHERE { ?tx <${ex}amount> ?amt . ?tx <${ex}velocity1h> ?vel }",
      Seq("amt", "vel"), "tx"))
    rt.materializeNeuralRelation(st, ex + "mlFraudLevel")
    val verdicts = new Compiler(st)
      .select(s"SELECT ?tx ?v WHERE { ?tx <${ex}mlFraudLevel> ?v }")
      .collect().map(r => r.getString(0).stripPrefix(ex) -> r.getString(1)).toMap
    assert(verdicts == Map("tx1" -> "fraud", "tx2" -> "not_fraud",
      "tx3" -> "not_fraud", "tx4" -> "not_fraud"))
    // pass-2: ML verdict AND velocity floor (rule_ml_assisted_alert)
    materialize(st, Seq(
      s"""RULE <r/ml> :- CONSTRUCT { ?tx <${ex}suspiciousFlag> <${ex}mlAssistedAlert> }
          WHERE { ?tx <${ex}mlFraudLevel> "fraud" . ?tx <${ex}velocity1h> ?vel .
                  FILTER(?vel > 3) }"""))
    val alerts = new Compiler(st)
      .select(s"SELECT ?tx WHERE { ?tx <${ex}suspiciousFlag> <${ex}mlAssistedAlert> }")
      .collect().map(_.getString(0).stripPrefix(ex)).toSet
    assert(alerts == Set("tx1"))
  }

  test("final verdict: transactions with two or more suspicious flags") {
    val st = QuadStore.fromTriples(spark, txTriples)
    materialize(st, pass1)
    val hot = new Compiler(st).select(
      s"""SELECT ?tx (COUNT(?f) AS ?n) WHERE {
            ?tx <${ex}suspiciousFlag> ?f
          } GROUP BY ?tx HAVING(COUNT(?f) >= 2) ORDER BY ?tx""")
      .collect().map(r => (r.getString(0).stripPrefix(ex), r.getLong(1)))
    assert(hot.toSeq == Seq(("tx1", 4L), ("tx4", 3L)))
  }
}
