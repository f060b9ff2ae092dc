package graft.mlx

import Py._

/** scikit-learn model adapters over the [[Pickle]] object graph — the
  * Spark-native replacement for the reference's pyo3 `MLHandler.predict`
  * (`ml/src/lib.rs:269-330`, which calls `model.predict(X)` in embedded
  * Python). Here the pickle's learned parameters are lifted into plain
  * serializable Scala values, broadcast, and evaluated per-row inside a
  * narrow mapPartitions — no Python interpreter anywhere on the cluster,
  * which is the difference between "works on the driver laptop" and
  * "runs on 1000 executors".
  *
  * Supported estimators (the ones the reference's own example zoo
  * pickles, `ml/examples/predictor.py:11-21,129-190`):
  * StandardScaler, LinearRegression/Ridge, LogisticRegression,
  * MLPRegressor, DecisionTreeRegressor, RandomForestRegressor,
  * GradientBoostingRegressor, and the reference's `BasePredictor`
  * wrapper shape (any object whose state carries a `scaler` and a
  * `model`). Unknown estimators fail loudly with the class name.
  */
sealed trait SkModel extends Serializable {
  def predict(x: Array[Double]): Double
}

/** Classifier with string labels (LogisticRegression). */
final case class SkClassifier(underlying: SkModel, classes: Vector[String])
    extends Serializable {
  def predictLabel(x: Array[Double]): String = {
    val z = underlying.predict(x)
    if (classes.length == 2) (if (z > 0) classes(1) else classes(0))
    else classes(z.toInt)
  }
}

object Sklearn {

  final case class Scaler(mean: Array[Double], scale: Array[Double],
      withMean: Boolean, withStd: Boolean) extends Serializable {
    def transform(x: Array[Double]): Array[Double] =
      Array.tabulate(x.length) { i =>
        val c = if (withMean) x(i) - mean(i) else x(i)
        if (withStd) c / scale(i) else c
      }
  }
  object Scaler {
    val identity: Scaler = Scaler(Array.empty, Array.empty, withMean = false, withStd = false)
  }

  final case class Linear(coef: Array[Double], intercept: Double) extends SkModel {
    def predict(x: Array[Double]): Double = {
      var z = intercept
      var i = 0
      while (i < coef.length) { z += coef(i) * x(i); i += 1 }
      z
    }
  }

  /** Binary decision function: w·x + b (label via [[SkClassifier]]). */
  final case class LogisticBinary(coef: Array[Double], intercept: Double) extends SkModel {
    def predict(x: Array[Double]): Double = Linear(coef, intercept).predict(x)
  }

  /** CART regression tree flattened to parallel arrays (the layout of
    * sklearn's `Tree.__getstate__()['nodes']` structured array). */
  final case class Cart(left: Array[Int], right: Array[Int],
      feature: Array[Int], threshold: Array[Double],
      value: Array[Double]) extends SkModel {
    def predict(x: Array[Double]): Double = {
      var n = 0
      while (left(n) != -1) {
        n = if (x(feature(n)) <= threshold(n)) left(n) else right(n)
      }
      value(n)
    }
  }

  final case class Forest(trees: Vector[Cart]) extends SkModel {
    def predict(x: Array[Double]): Double = {
      var s = 0.0
      trees.foreach(t => s += t.predict(x))
      s / trees.length
    }
  }

  final case class Gbt(base: Double, learningRate: Double, trees: Vector[Cart]) extends SkModel {
    def predict(x: Array[Double]): Double = {
      var s = base
      trees.foreach(t => s += learningRate * t.predict(x))
      s
    }
  }

  /** MLPRegressor forward pass: the pickle's hidden activation
    * (relu/tanh/logistic/identity), identity output (sklearn regressors
    * always use identity out). */
  final case class MlpReg(weights: Vector[Array[Array[Double]]],
      biases: Vector[Array[Double]], activation: String) extends SkModel {
    private def act(z: Double): Double = activation match {
      case "relu" => if (z < 0) 0.0 else z
      case "tanh" => math.tanh(z)
      case "logistic" => 1.0 / (1.0 + math.exp(-z))
      case _ => z // identity
    }
    def predict(x: Array[Double]): Double = {
      var a = x
      var l = 0
      while (l < weights.length) {
        val w = weights(l); val b = biases(l)
        val out = Array.tabulate(b.length) { j =>
          var z = b(j)
          var i = 0
          while (i < a.length) { z += a(i) * w(i)(j); i += 1 }
          if (l < weights.length - 1) act(z) else z
        }
        a = out
        l += 1
      }
      a(0)
    }
  }

  /** Scaler∘model pipeline (the reference's BasePredictor.predict order:
    * `scaler.transform` then `model.predict`, `predictor.py:33-40`). */
  final case class Pipeline(scaler: Scaler, model: SkModel) extends SkModel {
    def predict(x: Array[Double]): Double = model.predict(scaler.transform(x))
  }
  final case class PipelineClassifier(scaler: Scaler, cls: SkClassifier) extends Serializable {
    def predictLabel(x: Array[Double]): String = cls.predictLabel(scaler.transform(x))
  }

  // ------------------------------------------------------------------
  // graph → model
  // ------------------------------------------------------------------

  /** Load a regression model (possibly a BasePredictor-style wrapper)
    * from a pickle on the classpath or filesystem. */
  def loadRegressor(graph: V): SkModel = fromValue(graph)

  def loadClassifier(graph: V): PipelineClassifier = graph match {
    case o: Obj if attr(o, "model").isDefined && attr(o, "scaler").isDefined =>
      PipelineClassifier(scaler(attrOrFail(o, "scaler")), classifier(attrOrFail(o, "model")))
    case other => PipelineClassifier(Scaler.identity, classifier(other))
  }

  private def fromValue(v: V): SkModel = v match {
    case o: Obj => o.cls.name match {
      case "LinearRegression" | "Ridge" => linear(o)
      case "DecisionTreeRegressor" => cart(o)
      case "RandomForestRegressor" =>
        Forest(listOf(attrOrFail(o, "estimators_")).map(fromValue(_).asInstanceOf[Cart]))
      case "GradientBoostingRegressor" => gbt(o)
      case "MLPRegressor" => mlp(o)
      case _ if attr(o, "model").isDefined && attr(o, "scaler").isDefined =>
        // BasePredictor-shaped wrapper (any class name)
        Pipeline(scaler(attrOrFail(o, "scaler")), fromValue(attrOrFail(o, "model")))
      case other => throw new IllegalArgumentException(
        s"unsupported sklearn estimator ${o.cls.module}.$other")
    }
    case other => throw new IllegalArgumentException(s"not an estimator: $other")
  }

  private def listOf(v: V): Vector[V] = v match {
    case Lst(items) => items.toVector
    case Tup(items) => items
    case a: NdArray if a.objs.nonEmpty => a.objs.flatMap {
      case Lst(inner) => inner.toVector
      case Tup(inner) => inner
      case x => Vector(x)
    }
    case x => throw new IllegalArgumentException(s"not a sequence: $x")
  }

  def scaler(v: V): Scaler = v match {
    case o: Obj =>
      val withMean = attr(o, "with_mean").forall { case Bool(b) => b; case _ => true }
      val withStd = attr(o, "with_std").forall { case Bool(b) => b; case _ => true }
      Scaler(
        attr(o, "mean_").map(a => arr(a).toDoubles).getOrElse(Array.empty),
        attr(o, "scale_").map(a => arr(a).toDoubles).getOrElse(Array.empty),
        withMean, withStd)
    case x => throw new IllegalArgumentException(s"not a scaler: $x")
  }

  private def linear(o: Obj): Linear =
    Linear(arr(attrOrFail(o, "coef_")).toDoubles, toD(attrOrFail(o, "intercept_")))

  def classifier(v: V): SkClassifier = v match {
    case o: Obj if o.cls.name == "LogisticRegression" =>
      val classesArr = arr(attrOrFail(o, "classes_"))
      val classes =
        if (classesArr.objs.nonEmpty) classesArr.objs.map {
          case Str(s) => s
          case Num(l) => l.toString
          case x => x.toString
        }
        else classesArr.dtype.kind match {
          // real sklearn string labels: fixed-width unicode/bytes dtype
          case 'U' | 'S' => (0 until classesArr.n).toVector
            .map(classesArr.stringAt)
          case _ => classesArr.toLongs.toVector.map(_.toString)
        }
      require(classes.length == 2,
        s"only binary LogisticRegression supported (got ${classes.length} classes)")
      SkClassifier(
        LogisticBinary(arr(attrOrFail(o, "coef_")).toDoubles, toD(attrOrFail(o, "intercept_"))),
        classes)
    case o: Obj => throw new IllegalArgumentException(
      s"unsupported sklearn classifier ${o.cls.module}.${o.cls.name}")
    case x => throw new IllegalArgumentException(s"not a classifier: $x")
  }

  /** DecisionTreeRegressor → Cart: the `tree_` attribute is a
    * `sklearn.tree._tree.Tree` whose BUILD state dict holds the
    * structured `nodes` array and the `values` ndarray. */
  private def cart(o: Obj): Cart = {
    val tree = attrOrFail(o, "tree_") match {
      case t: Obj => t
      case x => throw new IllegalArgumentException(s"tree_ is $x")
    }
    val st = dict(tree.state)
    val nodes = arr(st(Str("nodes")))
    val values = arr(st(Str("values")))
    val n = nodes.shape.head
    Cart(
      Array.tabulate(n)(i => nodes.fieldL("left_child", i).toInt),
      Array.tabulate(n)(i => nodes.fieldL("right_child", i).toInt),
      Array.tabulate(n)(i => nodes.fieldL("feature", i).toInt),
      Array.tabulate(n)(i => nodes.field("threshold", i)),
      // values shape = (n_nodes, n_outputs=1, 1)
      Array.tabulate(n)(i => values.d(i)))
  }

  private def gbt(o: Obj): Gbt = {
    val lr = toD(attrOrFail(o, "learning_rate"))
    val base = attrOrFail(o, "init_") match {
      case i: Obj => attr(i, "constant_").map(c => arr(c).d(0))
        .getOrElse(toD(attrOrFail(i, "mean_")))
      case x => toD(x)
    }
    Gbt(base, lr, listOf(attrOrFail(o, "estimators_")).map(fromValue(_).asInstanceOf[Cart]))
  }

  private def mlp(o: Obj): MlpReg = {
    val ws = listOf(attrOrFail(o, "coefs_")).map { w =>
      val a = arr(w)
      val Vector(rows, cols) = a.shape
      Array.tabulate(rows, cols)((i, j) => a.d(i * cols + j))
    }
    val bs = listOf(attrOrFail(o, "intercepts_")).map(b => arr(b).toDoubles)
    val act = attr(o, "activation").map(str).getOrElse("relu")
    require(Seq("relu", "tanh", "logistic", "identity").contains(act),
      s"unsupported MLPRegressor activation '$act'")
    MlpReg(ws, bs, act)
  }
}
