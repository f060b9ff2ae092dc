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
}
