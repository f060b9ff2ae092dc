package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed-n-gram logistic-regression training semantics: the distributed
  * GD must equal a from-scratch driver-side reference on the same
  * features, and must actually learn a separable task. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join agg"),
    (2L, "spark filter scan"),
    (3L, "slow python loop here"),
    (4L, "row by row cursor loop"),
    (5L, "spark codegen stage"),
    (6L, "single thread pandas frame"),
    (7L, "")).toDF("doc_id", "text")
  private val label = array_contains(split(trim(lower(col("text"))), "\\s+"), "spark")

  // driver-side mirror of features(): md5-60 buckets over 1+2-grams,
  // L1-normalized counts
  private def refFeatures(text: String, dim: Int): Map[Long, Double] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val grams = toks ++ (if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
                         else Seq.empty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Long = {
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % dim
    }
    val counts = grams.groupBy(bucket).map { case (b, gs) => b -> gs.size.toDouble }
    val tot = counts.values.sum
    counts.map { case (b, c) => b -> c / tot }
  }

  private def refTrainScore(dim: Int, iters: Int, lr: Double)
      : Map[Long, (Double, Double)] = {
    val rows = docs.as[(Long, String)].collect().toSeq
    val feats = rows.map { case (id, t) => id -> refFeatures(t, dim) }.toMap
    val ys = rows.map { case (id, t) =>
      id -> (if (t.trim.toLowerCase.split("\\s+").contains("spark")) 1.0 else 0.0)
    }.toMap
    val n = rows.size.toDouble
    def sig(m: Double) = 1.0 / (1.0 + math.exp(-m))
    var w = Map.empty[Long, Double]; var b = 0.0
    for (_ <- 1 to iters) {
      val errs = rows.map { case (id, _) =>
        id -> (sig(b + feats(id).map { case (d, x) => x * w.getOrElse(d, 0.0) }.sum) - ys(id))
      }.toMap
      val g = rows.flatMap { case (id, _) =>
        feats(id).map { case (d, x) => d -> errs(id) * x } }
        .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).sum }
      w = (w.keySet ++ g.keySet).map(d =>
        d -> (w.getOrElse(d, 0.0) - lr * g.getOrElse(d, 0.0) / n)).toMap
      b -= lr * errs.values.sum / n
    }
    rows.map { case (id, _) =>
      id -> (ys(id), sig(b + feats(id).map { case (d, x) => x * w.getOrElse(d, 0.0) }.sum))
    }.toMap
  }

  test("distributed GD equals the driver-side reference to 1e-12") {
    val got = QualityClassifier.trainAndScore(docs, label, dim = 64,
        iters = 3, lr = 5.0, checkpointFeatures = false)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ref = refTrainScore(64, 3, 5.0)
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, (y, s)) =>
      assert(y == ref(id)._1, s"label for $id")
      assert(math.abs(s - ref(id)._2) < 1e-6, // scores rounded to 6dp
        s"doc $id: $s vs ${ref(id)._2}")
    }
  }

  test("learns the separable task: positives outscore negatives") {
    val scores = QualityClassifier.trainAndScore(docs, label, dim = 64,
        iters = 10, lr = 5.0, checkpointFeatures = false)
      .as[(Long, Double, Double)].collect()
    val pos = scores.filter(_._2 == 1.0).map(_._3)
    val neg = scores.filter(_._2 == 0.0).map(_._3)
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.min > neg.max,
      s"separation failed: pos ${pos.toSeq} vs neg ${neg.toSeq}")
  }

  test("zero-gram document scores sigmoid(bias)") {
    // doc 7 has text "" → one empty token still hashes (split yields [""]),
    // so use a corpus where the features genuinely vanish is impossible
    // with this tokenizer; instead pin the margin coalesce path directly:
    // a doc absent from the feature table must still be scored.
    val feat = QualityClassifier.features(docs, 64).filter(col("doc_id") =!= 7L)
    val labeled = docs.select(col("doc_id"), label.cast("double").as("y"))
    val m = QualityClassifier.Model(Map.empty, 2.0, 64)
    val s = QualityClassifier.score(feat, labeled, m)
      .filter(col("doc_id") === 7L).select("score").as[Double].head()
    assert(math.abs(s - 1.0 / (1.0 + math.exp(-2.0))) < 1e-6)
  }

  test("training is deterministic across runs") {
    def run() = QualityClassifier.trainAndScore(docs, label, dim = 32,
        iters = 2, lr = 1.0, checkpointFeatures = false)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }
}
