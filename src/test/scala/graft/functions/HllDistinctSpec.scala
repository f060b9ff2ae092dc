package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** HLL sketch semantics: bit-exact parity with the driver-side register
  * formula (both regimes), the documented 1.04/√m accuracy, merge
  * correctness via partition-count invariance, and input-domain guards. */
class HllDistinctSpec extends SparkSpec {
  import spark.implicits._

  HllDistinct.register(spark)

  private def md5h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** The exact estimate the aggregate documents, computed independently. */
  private def reference(values: Seq[String], p: Int): Double = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val regs = new Array[Int](m)
    values.map(md5h60).distinct.foreach { h =>
      val j = (h & (m - 1)).toInt
      val rho = maxRho - (64 - java.lang.Long.numberOfLeadingZeros(h >>> p))
      if (rho > regs(j)) regs(j) = rho
    }
    val s = regs.map(r => 1L << (maxRho - r)).sum
    val v = regs.count(_ == 0)
    val raw = 0.7213 / (1.0 + 1.079 / m.toDouble) * m * m *
      java.lang.Math.pow(2.0, maxRho) / s.toDouble
    if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v) else raw
  }

  test("bit-exact parity with the register formula, raw-estimate regime") {
    val vals = (1 to 10000).map(i => s"item$i")
    val est = vals.toDF("s")
      .select(HllDistinct(Dedup.md5Hash60($"s"), p = 9).as("e"))
      .as[Double].head()
    assert(est == reference(vals, 9))
    // documented accuracy: relative error ≈ 1.04/sqrt(m); allow 4 sigma
    assert(math.abs(est - 10000.0) / 10000.0 < 4.0 * 1.04 / math.sqrt(512.0),
      s"estimate $est too far from 10000")
  }

  test("bit-exact parity in the linear-counting (small-range) regime") {
    val vals = (1 to 60).flatMap(i => Seq(s"v$i", s"v$i")) // dups collapse
    val est = vals.toDF("s")
      .select(HllDistinct(Dedup.md5Hash60($"s"), p = 9).as("e"))
      .as[Double].head()
    assert(est == reference(vals, 9))
    // 60 distinct over 512 registers: linear counting is near-exact
    assert(math.abs(est - 60.0) < 3.0, s"linear-counting estimate $est")
  }

  test("partition-count invariant (merge path equals single partition)") {
    val vals = (1 to 5000).map(i => s"x${i % 1777}") // heavy duplicates
    def run(parts: Int): Double = vals.toDF("s").repartition(parts)
      .select(HllDistinct(Dedup.md5Hash60($"s"), p = 10).as("e"))
      .as[Double].head()
    assert(run(1) == run(16))
  }

  test("out-of-domain hash input is rejected, not silently mis-ranked") {
    for (bad <- Seq(-1L, 1L << 60)) {
      val e = intercept[org.apache.spark.SparkException] {
        Seq(bad, 2L).toDF("h")
          .agg(call_function("hll_distinct", $"h", lit(9), lit(60))).collect()
      }
      assert(e.getMessage.contains("outside") ||
        Option(e.getCause).exists(_.getMessage.contains("outside")), s"for $bad")
    }
  }

  test("sign-masked xxhash64 with domainBits=61 estimates correctly") {
    val vals = (1 to 20000).map(i => s"m$i")
    val est = vals.toDF("s")
      .select(HllDistinct(xxhash64($"s").bitwiseAND(lit((1L << 61) - 1)),
        p = 9, domainBits = 61).as("e"))
      .as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 4.0 * 1.04 / math.sqrt(512.0),
      s"estimate $est too far from 20000")
  }

  test("grouped sketches, nulls ignored, empty input = 0") {
    val df = Seq(("a", Some("t1")), ("a", Some("t2")), ("a", None),
      ("b", Some("t1"))).toDF("g", "s")
    val got = df.groupBy("g")
      .agg(HllDistinct(Dedup.md5Hash60($"s"), p = 9).as("e"))
      .as[(String, Double)].collect().toMap
    // linear counting with 1-2 distinct over 512 registers is near-exact
    assert(math.abs(got("a") - 2.0) < 0.02 && math.abs(got("b") - 1.0) < 0.01)
    // empty sketch: V = m, linear counting m·ln(1) = 0 exactly
    val empty = spark.emptyDataset[String].toDF("s")
      .agg(HllDistinct(Dedup.md5Hash60($"s"), p = 9).as("e"))
      .as[Double].head()
    assert(empty == 0.0)
  }
}
