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

    "ml_predict_sklearn_linear" -> ((s, dir) => {
      val rt = new MlRuntime(s)
      rt.loadSklearnRegressor("sk/lin", "res:/sklearn_linear.pkl")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      rt.predictSklearn(cust, "sk/lin", Seq("c_acctbal", "c_nationkey"), "pred")
        // floor-quantize instead of round(): both engines compute the
        // same IEEE double, but their round() implementations disagree on
        // exact half-boundaries (-131.0807175 rounds differently)
        .select(col("c_custkey"),
          floor(col("pred") * 1e6 + 0.5).cast("long").as("pred_micro"))
    }),

    "ml_predict_sklearn_rf" -> ((s, dir) => {
      val rt = new MlRuntime(s)
      rt.loadSklearnRegressor("sk/rf", "res:/sklearn_rf.pkl")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_acctbal"))
      rt.predictSklearn(cust, "sk/rf", Seq("c_acctbal"), "pred")
        .select(col("c_custkey"),
          floor(col("pred") * 1e6 + 0.5).cast("long").as("pred_micro"))
    }),

    "ml_predict_sklearn_logistic" -> ((s, dir) => {
      val rt = new MlRuntime(s)
      rt.loadSklearnClassifier("sk/logit", "res:/sklearn_logistic.pkl")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_acctbal"))
      rt.predictSklearnLabel(cust, "sk/logit", Seq("c_acctbal"), "label")
        .select(col("c_custkey"), col("label"))
    }),

    // TRAIN NEURAL RELATION end-to-end (VERDICT r9 item 6): the training
    // surface itself — grammar text → parseTrainNeuralRelation →
    // MlRuntime.trainNeuralRelation (SGD) → materialize → SPARQL read —
    // hash-checked. Determinism: Mlp.init and the epoch shuffles are
    // seeded (42), and the QUERY block carries ORDER BY ?c so the
    // collected training rows arrive in one canonical order — the learned
    // weights are therefore bit-identical run over run. Oracle
    // robustness: the task is 1-D separable (label = bal > 5000 on the
    // zero-centered feature (bal−5000)/3000), so the learned boundary
    // sits within a few data points of 5000; the EVAL set keeps only
    // wide-margin customers (|bal − 5000| > 1000), where the learned
    // labels coincide with the generating rule — which IS the SQL oracle.
    // An in-entry require makes any boundary drift loud rather than a
    // silent hash mismatch.
    "ml_train_predict" -> ((s, dir) => {
      val store = Triplizer.isolatedStore(s, dir, defaultGraph = true)
      val rt = new MlRuntime(s)
      rt.declareModel(ModelSpec("m/learned", Nil, Seq("pos"), binary = true))
      rt.declareNeuralRelation(NeuralRelationSpec(
        predicate = "ml/learned_tier",
        model = "m/learned",
        inputQuery = """SELECT ?c ?x WHERE {
            ?c <customer#c_acctbal> ?bal .
            BIND((?bal - 5000.0) / 3000.0 AS ?x) }""",
        featureVars = Seq("x"),
        anchorVar = "c"))
      val decl = graft.sparql.SparqlParser().parseTrainNeuralRelation(
        """TRAIN NEURAL RELATION <ml/learned_tier> {
             QUERY { SELECT ?c ?x ?lbl WHERE {
                 ?c <customer#c_acctbal> ?bal .
                 BIND((?bal - 5000.0) / 3000.0 AS ?x)
                 BIND(IF(?bal > 5000.0, "pos", "not_pos") AS ?lbl)
               } ORDER BY ?c }
             LABEL ?lbl
             TARGET { ?c <ml/learned_tier> ?lbl }
             LOSS binary_cross_entropy
             OPTIMIZER sgd
             LEARNING_RATE 0.5
             EPOCHS 30
             BATCH_SIZE 32
           }""")
      val losses = rt.trainNeuralRelation(store, decl)
      require(losses.last < losses.head,
        s"ml_train_predict: training loss did not decrease ($losses)")
      rt.materializeNeuralRelation(store, "ml/learned_tier")
      val out = new Compiler(store).select(
        """SELECT ?c ?tier WHERE {
             ?c <ml/learned_tier> ?tier .
             ?c <customer#c_acctbal> ?bal .
             FILTER(?bal > 6000.0 || ?bal < 4000.0) }""")
      // loud drift guard: on the wide-margin eval set the learned labels
      // must equal the generating rule exactly (the oracle's CASE)
      val drift = out.join(
          new Compiler(store).select(
            """SELECT ?c ?want WHERE {
                 ?c <customer#c_acctbal> ?bal .
                 BIND(IF(?bal > 5000.0, "pos", "not_pos") AS ?want)
                 FILTER(?bal > 6000.0 || ?bal < 4000.0) }"""),
          "c")
        .filter(col("tier") =!= col("want")).count()
      require(drift == 0L,
        s"ml_train_predict: learned boundary drifted into the eval margin ($drift rows)")
      out
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
         FROM customer""",

    // the generating rule, on the wide-margin eval set only — the learned
    // boundary provably (in-entry require) matches the rule there
    "ml_train_predict" ->
      """SELECT 'customer/' || CAST(c_custkey AS VARCHAR) AS c,
                CASE WHEN c_acctbal > 5000.0 THEN 'pos' ELSE 'not_pos' END AS tier
         FROM customer
         WHERE c_acctbal > 6000.0 OR c_acctbal < 4000.0""",

    // decision function 0.001·bal − 5 > 0 ⇔ bal > 5000; classes_
    // [neg, pos] from the fixture's object-dtype array
    "ml_predict_sklearn_logistic" ->
      """SELECT c_custkey,
                CASE WHEN 0.001 * c_acctbal - 5.0 > 0 THEN 'pos' ELSE 'neg' END AS label
         FROM customer""",

    // constants = the learned parameters baked into the pickle fixture
    // (scripts/gen_sklearn_fixtures.py); prediction = scaler ∘ linear
    "ml_predict_sklearn_linear" ->
      """SELECT c_custkey,
                CAST(floor((10.0 + 123.45 * ((c_acctbal - 4500.0) / 3000.0)
                           + -67.8 * ((c_nationkey - 12.0) / 7.0)) * 1000000 + 0.5) AS BIGINT) AS pred_micro
         FROM customer""",

    // the three fixture stumps, averaged (RandomForestRegressor)
    "ml_predict_sklearn_rf" ->
      """SELECT c_custkey,
                CAST(floor(((CASE WHEN c_acctbal <= 3000.0 THEN 100.0
                             WHEN c_acctbal <= 7000.0 THEN 250.0
                             ELSE 400.0 END)
                     + (CASE WHEN c_acctbal <= 5000.0 THEN 120.0 ELSE 380.0 END)
                     + (CASE WHEN c_acctbal <= 1000.0 THEN 80.0
                             WHEN c_acctbal <= 9000.0 THEN 260.0
                             ELSE 430.0 END)) / 3.0 * 1000000 + 0.5) AS BIGINT) AS pred_micro
         FROM customer""")
}
