package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.mlx.{Mlp, MlRuntime, ModelSpec, NeuralRelationSpec}
import graft.relational.Triplizer
import graft.sparql.Compiler

/** ML-surface queries (SURVEY §2.11). `ml_predict_fixed` and
  * `ml_neural_relation` use a fixed-weight single-layer model so the
  * decision boundary is exactly SQL-expressible (sigmoid(z) > 0.5 ⇔
  * z > 0) — this verifies the PREDICT plumbing (broadcast weights,
  * mapPartitions inference, fact materialization) against DuckDB.
  * Learned-weight behavior is asserted in MlSpec (accuracy on separable
  * data, loss monotonicity).
  */
object MlSuite {

  /** sigmoid(0.001·bal − 5) > 0.5 ⇔ bal > 5000. */
  private def fixedModel(rt: MlRuntime): Unit = {
    rt.declareModel(ModelSpec("m/fixed", Nil, Seq("pos"), binary = true))
    rt.setWeights("m/fixed",
      Mlp(Array(Array(Array(0.001, -5.0))), Seq("pos"), binary = true))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_predict_fixed" -> ((s, dir) => {
      val rt = new MlRuntime(s)
      fixedModel(rt)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_acctbal"))
      rt.predict(cust, "m/fixed", Seq("c_acctbal"), "tier")
        .select(col("c_custkey"), col("tier"))
    }),

    "ml_neural_relation" -> ((s, dir) => {
      val store = Triplizer.isolatedStore(s, dir, defaultGraph = true)
      val rt = new MlRuntime(s)
      fixedModel(rt)
      rt.declareNeuralRelation(NeuralRelationSpec(
        predicate = "ml/tier",
        model = "m/fixed",
        inputQuery = "SELECT ?c ?bal WHERE { ?c <customer#c_acctbal> ?bal }",
        featureVars = Seq("bal"),
        anchorVar = "c"))
      rt.materializeNeuralRelation(store, "ml/tier")
      new Compiler(store).select(
        "SELECT ?c ?tier WHERE { ?c <ml/tier> ?tier }")
    }))

  val oracleSql: Map[String, String] = Map(
    "ml_predict_fixed" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal > 5000.0 THEN 'pos' ELSE 'not_pos' END AS tier
         FROM customer""",

    "ml_neural_relation" ->
      """SELECT 'customer/' || CAST(c_custkey AS VARCHAR) AS c,
                CASE WHEN c_acctbal > 5000.0 THEN 'pos' ELSE 'not_pos' END AS tier
         FROM customer""")
}
