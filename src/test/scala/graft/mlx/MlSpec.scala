package graft.mlx

import graft.SparkSpec
import graft.model.QuadStore
import graft.sparql.{Compiler, SparqlParser}
import org.apache.spark.sql.functions._

/** ML surface semantics (SURVEY §2.11): declarations parse, training
  * learns separable data, PREDICT is a distributed stage, NEURAL RELATION
  * materializes facts queryable via SPARQL
  * (mirrors `kolibrie/tests/ml_predict_candle_runtime.rs` coverage). */
class MlSpec extends SparkSpec {
  import spark.implicits._

  test("model / neural relation / ml.predict declarations parse") {
    val p = SparqlParser()
    val (n, h, outs) = p.parseModel(
      """MODEL <m/demo> { mlp(hidden=8,4); output "a" "b"; }""")
    assert(n == "m/demo" && h == Seq(8, 4) && outs == Seq("a", "b"))
    val (pred, m, q, fs, a) = p.parseNeuralRelation(
      """NEURAL RELATION <nr/p> USING MODEL <m/demo> {
           INPUT { SELECT ?c ?x WHERE { ?c <v> ?x } }
           FEATURES ?x ANCHOR ?c }""")
    assert(pred == "nr/p" && m == "m/demo" && fs == Seq("x") && a == "c")
    assert(q.projection == Seq("c", "x"))
    val (m2, q2, out) = p.parseMlPredict(
      """ML.PREDICT(MODEL <m/demo>, INPUT { SELECT ?x WHERE { ?s <v> ?x } }) AS ?y""")
    assert(m2 == "m/demo" && out == "y" && q2.projection == Seq("x"))
  }

  test("training learns a linearly separable binary task; loss decreases") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val x1 = rnd.nextDouble() * 2 - 1
      val x2 = rnd.nextDouble() * 2 - 1
      (x1, x2, if (x1 + x2 > 0) "hi" else "lo")
    }
    val df = rows.toDF("x1", "x2", "label")
    val rt = new MlRuntime(spark)
    rt.declareModel(ModelSpec("m/sep", Seq(8), Seq("hi", "lo"), binary = false))
    val losses = rt.train("m/sep", df, Seq("x1", "x2"), "label",
      lr = 0.1, epochs = 30, batch = 16)
    assert(losses.last < losses.head * 0.5, s"loss did not drop: $losses")
    val preds = rt.predict(df, "m/sep", Seq("x1", "x2"), "pred")
    val acc = preds.filter(col("pred") === col("label")).count().toDouble / rows.size
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("binary head with fixed weights matches threshold semantics") {
    val rt = new MlRuntime(spark)
    rt.declareModel(ModelSpec("m/fix", Nil, Seq("pos"), binary = true))
    rt.setWeights("m/fix", Mlp(Array(Array(Array(1.0, -2.0))), Seq("pos"), binary = true))
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val out = rt.predict(df, "m/fix", Seq("x"), "y")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(out == Set((1.0, "not_pos"), (2.0, "not_pos"), (3.0, "pos")))
  }

  test("TRAIN NEURAL RELATION syntax parses and trains (parser.rs:2391-2503)") {
    val p = SparqlParser()
    val decl = p.parseTrainNeuralRelation(
      """TRAIN NEURAL RELATION <ml/size> {
           DATA { ?e <score> ?s . ?e <cls> ?lbl }
           LABEL ?lbl
           TARGET { ?e <ml/size> ?lbl }
           LOSS cross_entropy
           OPTIMIZER sgd
           LEARNING_RATE 0.1
           EPOCHS 25
           BATCH_SIZE 8
           SAVE_TO "/tmp/m_size.bin"
         }""")
    assert(decl.predicate == "ml/size" && decl.labelVar == "lbl")
    assert(decl.loss == "cross_entropy" && decl.optimizer == "sgd")
    assert(decl.learningRate == 0.1 && decl.epochs == 25 && decl.batchSize == 8)
    assert(decl.savePath.contains("/tmp/m_size.bin"))
    // missing mandatory clause → parse error (reference ok_or_else arms)
    intercept[Exception](p.parseTrainNeuralRelation(
      """TRAIN NEURAL RELATION <ml/size> {
           DATA { ?e <score> ?s } LABEL ?s TARGET { ?e <ml/size> ?s } }"""))

    // end-to-end: train through the reference grammar, then materialize
    val rnd = new scala.util.Random(3)
    val triples = (1 to 200).flatMap { i =>
      val v = rnd.nextDouble() * 10
      Seq((s"e$i", "score", f"$v%.3f"),
          (s"e$i", "cls", if (v > 5) "big" else "small"))
    }
    val store = QuadStore.fromTriples(spark, triples)
    val rt = new MlRuntime(spark)
    rt.declareModel(ModelSpec("m/sz", Seq(4), Seq("big", "small"), binary = false))
    rt.declareNeuralRelation(NeuralRelationSpec(
      "ml/size", "m/sz", "SELECT ?e ?s WHERE { ?e <score> ?s }", Seq("s"), "e"))
    val losses = rt.trainNeuralRelation(store, decl)
    assert(losses.last < losses.head, s"loss did not drop: $losses")
    val preds = rt.predict(
      new Compiler(store).select("SELECT ?e ?s ?lbl WHERE { ?e <score> ?s . ?e <cls> ?lbl }"),
      "m/sz", Seq("s"), "pred")
    val acc = preds.filter(col("pred") === col("lbl")).count().toDouble / 200
    assert(acc > 0.85, s"accuracy $acc")
    assert(rt.modelArtifacts("m/sz") == "/tmp/m_size.bin")
  }

  test("neural relation materializes facts queryable via SPARQL") {
    val store = QuadStore.fromTriples(spark,
      Seq(("e1", "score", "10"), ("e2", "score", "1")))
    val rt = new MlRuntime(spark)
    rt.declareModel(ModelSpec("m/t", Nil, Seq("big"), binary = true))
    rt.setWeights("m/t", Mlp(Array(Array(Array(1.0, -5.0))), Seq("big"), binary = true))
    rt.declareNeuralRelation(NeuralRelationSpec(
      "ml/size", "m/t", "SELECT ?e ?s WHERE { ?e <score> ?s }", Seq("s"), "e"))
    rt.materializeNeuralRelation(store, "ml/size")
    val r = new Compiler(store).select("SELECT ?e ?v WHERE { ?e <ml/size> ?v }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(r == Set(("e1", "big"), ("e2", "not_big")))
  }

  // ---- sklearn-pickle fallback (`ml/src/lib.rs:160-330` parity) ----

  test("sklearn linear pipeline pickle: scaler+coef parsed, predictions exact") {
    val m = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_linear.pkl"))
    // prediction = 123.45*((x0-4500)/3000) - 67.8*((x1-12)/7) + 10
    def expect(x0: Double, x1: Double): Double =
      123.45 * ((x0 - 4500.0) / 3000.0) - 67.8 * ((x1 - 12.0) / 7.0) + 10.0
    assert(m.predict(Array(4500.0, 12.0)) == 10.0)
    assert(math.abs(m.predict(Array(7500.0, 5.0)) - expect(7500.0, 5.0)) < 1e-12)
    assert(math.abs(m.predict(Array(0.0, 24.0)) - expect(0.0, 24.0)) < 1e-12)
  }

  test("sklearn pickle protocols 2 and 4 parse to identical models") {
    val p4 = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_linear.pkl"))
    val p2 = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_linear_p2.pkl"))
    for (x <- Seq(Array(1000.0, 3.0), Array(9999.5, 21.0), Array(-50.0, 0.0)))
      assert(p4.predict(x) == p2.predict(x))
  }

  test("sklearn random forest pickle: structured node arrays walk correctly") {
    val m = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_rf.pkl"))
    // hand-evaluate the three stumps
    def t1(x: Double) = if (x <= 3000) 100.0 else if (x <= 7000) 250.0 else 400.0
    def t2(x: Double) = if (x <= 5000) 120.0 else 380.0
    def t3(x: Double) = if (x <= 1000) 80.0 else if (x <= 9000) 260.0 else 430.0
    for (x <- Seq(0.0, 1000.0, 2999.9, 3000.0, 5000.1, 8000.0, 9500.0))
      assert(m.predict(Array(x)) == (t1(x) + t2(x) + t3(x)) / 3.0, s"at $x")
  }

  test("sklearn gradient boosting pickle: init + lr-weighted stumps") {
    val m = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_gbt.pkl"))
    def expect(x: Double) = 5000.0 +
      0.1 * (if (x <= 4000) -500.0 else 1500.0) +
      0.1 * (if (x <= 8000) -200.0 else 900.0)
    for (x <- Seq(0.0, 4000.0, 6000.0, 8000.1, 12000.0))
      assert(m.predict(Array(x)) == expect(x), s"at $x")
  }

  test("sklearn logistic pickle: binary labels from object-dtype classes_") {
    val m = Sklearn.loadClassifier(Pickle.loadResource("/sklearn_logistic.pkl"))
    assert(m.predictLabel(Array(6000.0)) == "pos") // 0.001*6000-5 > 0
    assert(m.predictLabel(Array(4000.0)) == "neg")
  }

  test("sklearn logistic pickle with REAL unicode-dtype classes_") {
    // a genuine fit on string labels stores classes_ as '<U3', not object
    val m = Sklearn.loadClassifier(Pickle.loadResource("/sklearn_logistic_u.pkl"))
    assert(m.predictLabel(Array(6000.0)) == "pos")
    assert(m.predictLabel(Array(4000.0)) == "neg")
  }

  test("sklearn MLP pickle honors the pickled tanh activation") {
    val m = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_mlp_tanh.pkl"))
    // hidden = tanh(x0 + 0.5*x1 + 0.25); out = 2*h - 1
    def expect(x0: Double, x1: Double): Double =
      2.0 * math.tanh(x0 + 0.5 * x1 + 0.25) - 1.0
    for ((a, b) <- Seq((0.0, 0.0), (1.5, -2.0), (-0.7, 0.3)))
      assert(math.abs(m.predict(Array(a, b)) - expect(a, b)) < 1e-12)
  }

  test("sklearn MLPRegressor pickle: relu-hidden forward pass") {
    val m = Sklearn.loadRegressor(Pickle.loadResource("/sklearn_mlp.pkl"))
    // hidden = relu([x0*1+x1*0.5+0.5, -x0+2*x1-0.25]); out = 3*h0-2*h1+1
    def expect(x0: Double, x1: Double): Double = {
      val h0 = math.max(0, x0 + 0.5 * x1 + 0.5)
      val h1 = math.max(0, -x0 + 2 * x1 - 0.25)
      3 * h0 - 2 * h1 + 1
    }
    for ((a, b) <- Seq((0.0, 0.0), (1.0, 2.0), (-3.0, 0.5), (2.5, -1.0)))
      assert(math.abs(m.predict(Array(a, b)) - expect(a, b)) < 1e-12)
  }

  test("predictSklearn is a distributed narrow stage over a DataFrame") {
    val rt = new MlRuntime(spark)
    rt.loadSklearnRegressor("lin", "res:/sklearn_linear.pkl")
    val df = Seq((1L, 4500.0, 12.0), (2L, 7500.0, 5.0)).toDF("id", "bal", "nat")
    val out = rt.predictSklearn(df, "lin", Seq("bal", "nat"), "pred")
      .select("id", "pred").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 10.0)
    assert(math.abs(out(2L) - (123.45 * 1.0 - 67.8 * (-1.0) + 10.0)) < 1e-12)
  }

  test("executeMlPredict dispatches native-first with sklearn fallback") {
    val store = QuadStore.fromTriples(spark,
      Seq(("e1", "score", "6000"), ("e2", "score", "1000")))
    val rt = new MlRuntime(spark)
    // native MLP registered under m/native
    rt.declareModel(ModelSpec("m/native", Nil, Seq("big"), binary = true))
    rt.setWeights("m/native", Mlp(Array(Array(Array(0.001, -5.0))), Seq("big"), binary = true))
    val native = rt.executeMlPredict(store,
      """ML.PREDICT(MODEL <m/native>,
           INPUT { SELECT ?s WHERE { ?e <score> ?s } }) AS ?y""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(native == Set(("6000", "big"), ("1000", "not_big")))
    // sklearn classifier fallback under a name with no native model
    rt.loadSklearnClassifier("m/pickle", "res:/sklearn_logistic.pkl")
    val fallback = rt.executeMlPredict(store,
      """ML.PREDICT(MODEL <m/pickle>,
           INPUT { SELECT ?s WHERE { ?e <score> ?s } }) AS ?y""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fallback == Set(("6000", "pos"), ("1000", "neg")))
    // unknown model fails loudly
    val ex = intercept[IllegalStateException](rt.executeMlPredict(store,
      """ML.PREDICT(MODEL <m/ghost>, INPUT { SELECT ?s WHERE { ?e <score> ?s } }) AS ?y"""))
    assert(ex.getMessage.contains("m/ghost"))
  }

  test("model discovery: TTL schemas parsed via graft SPARQL, best by resource score") {
    val dir = java.nio.file.Files.createTempDirectory("skmodels").toFile
    def copyRes(res: String, name: String): Unit = {
      val in = getClass.getResourceAsStream(res)
      java.nio.file.Files.copy(in, new java.io.File(dir, name).toPath)
      in.close()
    }
    copyRes("/sklearn_linear.pkl", "alpha.pkl")
    copyRes("/sklearn_rf.pkl", "beta.pkl")
    def ttl(evalIri: String, vals: Map[String, Double]): String =
      s"""@prefix mls: <http://www.w3.org/ns/mls#> .
         |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
         |""".stripMargin + vals.zipWithIndex.map { case ((label, v), i) =>
        s"""<$evalIri/e$i> a mls:ModelEvaluation .
           |<$evalIri/e$i> mls:specifiedBy <$evalIri/m$i> .
           |<$evalIri/e$i> mls:hasValue "$v" .
           |<$evalIri/m$i> rdfs:label "$label" .
           |""".stripMargin
      }.mkString
    // alpha: cheap (score 0.5*10+0.4*20+0.1*1 = 13.1); beta: expensive (61.0)
    java.nio.file.Files.write(new java.io.File(dir, "alpha.ttl").toPath,
      ttl("urn:alpha", Map("cpu_usage_percent" -> 10, "memory_usage_mb" -> 20,
        "prediction_time" -> 1, "mse" -> 0.5, "r2" -> 0.9)).getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "beta.ttl").toPath,
      ttl("urn:beta", Map("cpu_usage_percent" -> 90, "memory_usage_mb" -> 40,
        "prediction_time" -> 0.1)).getBytes)
    val rt = new MlRuntime(spark)
    val found = rt.discoverAndLoadModels(dir.getPath)
    assert(found == Seq("alpha", "beta"))
    assert(rt.bestSklearnModel.contains("alpha"))
    assert(rt.sklearnSchemas("alpha").r2.contains(0.9))
    assert(rt.sklearnSchemas("beta").cpuPct == 90.0)
    // only the best model's parameters were loaded (two-pass discovery)
    assert(rt.sklearnModels.keySet == Set("alpha"))
    assert(rt.sklearnModels("alpha").predict(Array(4500.0, 12.0)) == 10.0)
  }
}
