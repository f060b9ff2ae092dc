package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** KMV sketch semantics: exact below k, the (k−1)·domain/h_(k) estimator
  * above it, partition-count invariance (merge correctness), and the
  * documented accuracy bound on a real cardinality. */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  KmvDistinct.register(spark)

  private def md5h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("exact count while fewer than k distinct values were seen") {
    val df = (1 to 40).flatMap(i => Seq(s"v$i", s"v$i")).toDF("s") // dups
    val est = df.select(KmvDistinct(Dedup.md5Hash60($"s"), k = 64).as("e"))
      .as[Double].head()
    assert(est == 40.0)
  }

  test("estimator equals the driver-side k-th-smallest formula") {
    val vals = (1 to 1000).map(i => s"item$i")
    val df = vals.toDF("s")
    val est = df.select(KmvDistinct(Dedup.md5Hash60($"s"), k = 32).as("e"))
      .as[Double].head()
    val h32 = vals.map(md5h60).distinct.sorted.apply(31)
    assert(math.abs(est - 31.0 * math.pow(2.0, 60) / h32) < 1e-6)
    // documented bound: relative error ≈ 1/sqrt(k-2); allow 4 sigma
    assert(math.abs(est - 1000.0) / 1000.0 < 4.0 / math.sqrt(30.0),
      s"estimate $est too far from 1000")
  }

  test("partition-count invariant (merge path equals single partition)") {
    val vals = (1 to 5000).map(i => s"x${i % 1777}") // heavy duplicates
    def run(parts: Int): Double = vals.toDF("s").repartition(parts)
      .select(KmvDistinct(Dedup.md5Hash60($"s"), k = 100).as("e"))
      .as[Double].head()
    assert(run(1) == run(16))
  }

  test("negative hash input is rejected, not silently mis-estimated") {
    val e = intercept[org.apache.spark.SparkException] {
      Seq(-1L, 2L).toDF("h")
        .agg(call_function("kmv_distinct", $"h", lit(8), lit(60))).collect()
    }
    assert(e.getMessage.contains("negative") ||
      Option(e.getCause).exists(_.getMessage.contains("negative")))
  }

  test("sign-masked xxhash64 with domainBits=63 estimates correctly") {
    val vals = (1 to 2000).map(i => s"m$i")
    val est = vals.toDF("s")
      .select(KmvDistinct(xxhash64($"s").bitwiseAND(lit(Long.MaxValue)),
        k = 64, domainBits = 63).as("e"))
      .as[Double].head()
    assert(math.abs(est - 2000.0) / 2000.0 < 4.0 / math.sqrt(62.0),
      s"estimate $est too far from 2000")
  }

  test("grouped sketches, nulls ignored, empty group = 0") {
    val df = Seq(("a", Some("t1")), ("a", Some("t2")), ("a", None),
      ("b", Some("t1"))).toDF("g", "s")
    val got = df.groupBy("g")
      .agg(KmvDistinct(Dedup.md5Hash60($"s"), k = 8).as("e"))
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 2.0, "b" -> 1.0))
    val empty = spark.emptyDataset[String].toDF("s")
      .agg(KmvDistinct(Dedup.md5Hash60($"s"), k = 8).as("e"))
      .as[Double].head()
    assert(empty == 0.0)
  }
}
