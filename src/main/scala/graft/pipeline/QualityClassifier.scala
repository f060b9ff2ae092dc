package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-shaped quality classifier (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification" — the architecture CCNet
  * and the LLaMA/RedPajama pipelines use for quality filtering): a
  * linear model over hashed bag-of-n-gram features, trained HERE with
  * full-batch gradient descent expressed as DataFrame aggregations.
  *
  * This is the missing half of the scoring-only operators ([[Dsir]],
  * [[TextAnalysis.gopherQuality]]): the pipeline LEARNS the filter from
  * labeled examples (e.g. "wiki vs crawl") instead of hand-tuning
  * heuristics, and training itself is distributed.
  *
  * Scale shape: features hash into `dim` buckets via the
  * engine-portable md5-60 hash ([[Dedup.md5Hash60]] — DuckDB reproduces
  * training bit-for-bit), so model state is O(dim) regardless of corpus
  * size. Each GD step is two shuffles — a doc-keyed margin aggregation
  * and a bucket-keyed gradient aggregation whose output is ≤ dim rows —
  * and the updated weight vector broadcasts back. The feature table is
  * built once (localCheckpoint) and reused across steps; the corpus
  * text is tokenized exactly once. No driver loop ever touches
  * per-document data — the driver only holds the dim-sized weight
  * vector, the textbook parameter-server split.
  */
object QualityClassifier {

  /** Trained model: sparse weights over feature buckets + bias. */
  final case class Model(weights: Map[Long, Double], bias: Double, dim: Int)

  /** Hashed bag-of-n-gram features, L1-normalized per document (the
    * fastText "mean of word vectors" convention for a linear model):
    * (idCol, bucket, x) with x = count(bucket in doc) / grams(doc).
    * Documents with zero grams emit no rows — scoring coalesces their
    * margin to the bias. */
  def features(docs: DataFrame, dim: Int, ns: Seq[Int] = Seq(1, 2),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim $dim must be positive")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns $ns must be positive")
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(trim(lower(col(textCol)))).as("__toks"))
    val grams = ns.map(n => TextAnalysis.ngramsOfTokens(col("__toks"), n))
      .reduce(concat(_, _))
    toks.select(col(idCol), explode(grams).as("__gram"))
      .select(col(idCol),
        pmod(Dedup.md5Hash60(col("__gram")), lit(dim.toLong)).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("__c"))
      .withColumn("x", col("__c").cast("double") /
        sum("__c").over(org.apache.spark.sql.expressions.Window.partitionBy(idCol)))
      .drop("__c")
  }

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Per-document margin b + Σ x·w under broadcast weights:
    * (idCol, y, __m). `labeled` is (idCol, y) with y ∈ {0.0, 1.0}. */
  private def margins(feat: DataFrame, labeled: DataFrame,
      weights: Map[Long, Double], bias: Double, idCol: String): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("bucket", "__w")
    val contrib = feat.join(broadcast(wdf), Seq("bucket"))
      .select(col(idCol), (col("x") * col("__w")).as("__xw"))
    labeled.join(contrib.groupBy(idCol).agg(sum("__xw").as("__sw")),
        Seq(idCol), "left_outer")
      .select(col(idCol), col("y"),
        (lit(bias) + coalesce(col("__sw"), lit(0.0))).as("__m"))
  }

  /** Full-batch logistic-regression GD from w = 0, b = 0 (so step 1's
    * p = 0.5 everywhere — deterministic, no random init to mirror).
    * `labeled` is (idCol, y). Loss is mean log-loss; the update is
    * w ← w − lr·∇ with ∇_d = mean((p − y)·x_d). */
  def train(feat: DataFrame, labeled: DataFrame, dim: Int, iters: Int,
      lr: Double, idCol: String = "doc_id"): Model = {
    require(iters >= 1, s"iters $iters must be >= 1")
    val n = labeled.count().toDouble
    require(n > 0, "train: no labeled documents")
    // the bias is gradient bucket −1 with constant feature 1.0, so ONE
    // bucket-keyed aggregation per step carries weights and bias both
    val featB = feat.select(col(idCol), col("bucket"), col("x"))
      .unionAll(labeled.select(col(idCol), lit(-1L).as("bucket"), lit(1.0).as("x")))
    var w = Map.empty[Long, Double]
    var b = 0.0
    for (_ <- 1 to iters) {
      val err = margins(feat, labeled, w, b, idCol)
        .select(col(idCol), (sigmoid(col("__m")) - col("y")).as("__err"))
      val grads = featB.join(err, Seq(idCol))
        .select(col("bucket"), (col("__err") * col("x")).as("__gx"))
        .groupBy("bucket").agg(sum("__gx").as("__g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      w = ((w.keySet ++ grads.keySet) - (-1L)).map { d =>
        d -> (w.getOrElse(d, 0.0) - lr * grads.getOrElse(d, 0.0) / n)
      }.toMap
      b -= lr * grads.getOrElse(-1L, 0.0) / n
    }
    Model(w, b, dim)
  }

  /** Score every labeled document under the model:
    * (idCol, y, score = sigmoid(margin) rounded to 6 decimals). */
  def score(feat: DataFrame, labeled: DataFrame, model: Model,
      idCol: String = "doc_id"): DataFrame =
    margins(feat, labeled, model.weights, model.bias, idCol)
      .select(col(idCol), col("y"), round(sigmoid(col("__m")), 6).as("score"))

  /** Train-and-score convenience over one corpus: labels from `label`
    * (must evaluate to 0.0/1.0 double). The feature table is
    * checkpointed once and reused by every GD step and the final
    * scoring pass. */
  def trainAndScore(docs: DataFrame, label: Column, dim: Int, iters: Int,
      lr: Double, idCol: String = "doc_id", textCol: String = "text",
      checkpointFeatures: Boolean = true): DataFrame = {
    val feat0 = features(docs, dim, Seq(1, 2), idCol, textCol)
    val feat = if (checkpointFeatures) feat0.localCheckpoint() else feat0
    val labeled0 = docs.select(col(idCol), label.cast("double").as("y"))
    val labeled = if (checkpointFeatures) labeled0.localCheckpoint() else labeled0
    val model = train(feat, labeled, dim, iters, lr, idCol)
    score(feat, labeled, model, idCol)
  }
}
