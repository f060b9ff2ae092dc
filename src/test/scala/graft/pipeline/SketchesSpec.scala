package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch guarantees: no underestimation, exact collapse at
  * w=1, partition invariance, and null handling. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
    Seq.fill(5)("dd") ++ Seq(null.asInstanceOf[String])
  private def df = keys.toDF("k")

  test("count-min never underestimates and is exact without collisions") {
    val cms = Sketches.countMin(df, "k", d = 4, w = 4096)
    val est = Sketches.countMinEstimate(cms, Seq("a", "b", "c", "dd").toDF("k"),
      "k", d = 4, w = 4096).as[(String, Long)].collect().toMap
    val truth = Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "dd" -> 5L)
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k underestimated: ${est(k)} < $n") }
    // 4 keys in 4096 buckets × 4 depths: min-over-depths collides with
    // probability < 1e-10 — treat as exact (deterministic given the data)
    assert(est == truth)
  }

  test("w=1 collapses every counter to the total key count") {
    val cms = Sketches.countMin(df, "k", d = 3, w = 1)
    // 16 non-null keys, every depth has the single bucket at 16
    assert(cms.select("cnt").as[Long].collect().toSeq == Seq(16L, 16L, 16L))
    val est = Sketches.countMinEstimate(cms, Seq("a", "zzz").toDF("k"),
      "k", d = 3, w = 1).as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 16L, "zzz" -> 16L))
  }

  test("sketch is partition-invariant and total-count preserving") {
    def run(parts: Int) = Sketches.countMin(df.repartition(parts), "k", d = 4, w = 64)
      .as[(Int, Int, Long)].collect().toSet
    assert(run(1) == run(8))
    // every depth's counters sum to the number of non-null keys
    val sums = Sketches.countMin(df, "k", d = 4, w = 64)
      .groupBy("depth").agg(sum("cnt").as("s")).select("s").as[Long].collect()
    assert(sums.toSeq == Seq.fill(4)(16L))
  }

  test("mismatched estimate parameters are refused via carried metadata") {
    val cms = Sketches.countMin(df, "k", d = 4, w = 1024)
    // wrong w or d would coalesce missing buckets to 0 under the min —
    // a silent understatement; the carried (d, w) metadata rejects it
    val e1 = intercept[IllegalArgumentException](
      Sketches.countMinEstimate(cms, Seq("a").toDF("k"), "k", d = 4, w = 512))
    assert(e1.getMessage.contains("built with d=4, w=1024"))
    intercept[IllegalArgumentException](
      Sketches.countMinEstimate(cms, Seq("a").toDF("k"), "k", d = 2, w = 1024))
    // a foreign sketch without metadata stays caller-checked (no throw)
    val foreign = cms.select(col("depth").cast("int").as("depth"), col("bucket"), col("cnt"))
    Sketches.countMinEstimate(foreign, Seq("a").toDF("k"), "k", d = 2, w = 512).collect()
  }

  test("metadata survives a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    Sketches.countMin(df, "k", d = 4, w = 1024).write.mode("overwrite")
      .parquet(s"$dir/cms")
    val back = spark.read.parquet(s"$dir/cms")
    intercept[IllegalArgumentException](
      Sketches.countMinEstimate(back, Seq("a").toDF("k"), "k", d = 4, w = 512))
    val est = Sketches.countMinEstimate(back, Seq("a").toDF("k"), "k", d = 4, w = 1024)
      .as[(String, Long)].collect().toMap
    assert(est("a") == 7L)
  }

  test("unseen key over a sparse sketch estimates zero") {
    val cms = Sketches.countMin(Seq("only").toDF("k"), "k", d = 4, w = 4096)
    val est = Sketches.countMinEstimate(cms, Seq("absent").toDF("k"),
      "k", d = 4, w = 4096).as[(String, Long)].collect().toMap
    assert(est("absent") == 0L) // all 4 buckets empty w.h.p. (deterministic here)
  }
}
