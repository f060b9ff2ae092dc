package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFnsSpec extends SparkSpec {

  test("bloom filter: no false negatives, and real pruning on disjoint keys") {
    import spark.implicits._
    BloomFns.register(spark)
    (0L until 1000L).toDF("k").createOrReplaceTempView("bloom_build")
    // probe = the build keys plus a disjoint range
    (0L until 10000L).toDF("k").createOrReplaceTempView("bloom_probe")
    val kept = spark.sql(
      """SELECT k FROM bloom_probe
         WHERE graft_might_contain(
           (SELECT graft_bloom_agg(k, 1000L, 16000L) FROM bloom_build), k)""")
      .as[Long].collect().toSet
    // every true member passes (bloom guarantees no false negatives)
    assert((0L until 1000L).forall(kept.contains), "false negative in bloom")
    // and most of the 9000 disjoint keys are pruned (fp rate at 16 bits
    // per item is well under 1%; allow a generous margin)
    assert(kept.size < 1000 + 500, s"bloom pruned almost nothing: ${kept.size}")
  }

  test("registration is idempotent and arity errors are loud") {
    BloomFns.register(spark)
    BloomFns.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_might_contain(CAST(NULL AS BINARY))").collect()
    }
    assert(e.getMessage.contains("graft_might_contain"))
  }
}
