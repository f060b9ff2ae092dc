package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bit parity of the compiled MinHash-signature kernel against the
  * Column formulations it replaced: the interpreted HOF shape
  * (reconstructed here exactly as `minHashSignaturesNarrow` used to
  * build it) and the explode + partial-agg batch form
  * ([[Dedup.minHashSignatures]]) on the real corpus — both hash
  * families. The tokenization corners (SQL trim strips 0x20 only;
  * split keeps trailing empty strings) are exercised explicitly with
  * tab/space-adorned inputs. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val nh = 16
  private val MhPrime = 2147483647L

  /** The pre-kernel Column formulation, verbatim. */
  private def hofSigs(docs: DataFrame, portable: Boolean): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val n = size(toks)
    val shArr = array_distinct(when(n >= k,
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast(ArrayType(StringType))))
    def perm(s: org.apache.spark.sql.Column, i: Int) =
      if (portable) {
        val (a, b) = Dedup.mhCoeffs(i)
        pmod(lit(a) * pmod(Dedup.md5Hash60(s), lit(MhPrime)) + lit(b), lit(MhPrime))
      } else xxhash64(lit(i), s)
    val s16 = array((0 until nh).map(i =>
      array_min(transform(col("__sh"), s => perm(s, i)))): _*)
    docs.withColumn("__sh", shArr).filter(size(col("__sh")) > 0)
      .withColumn("sig", s16).drop("__sh")
  }

  private val edgeDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  leading and trailing spaces   "),
    (3L, "\tleading tab keeps an empty first token"),
    (4L, "trailing tab keeps an empty last token\t"),
    (5L, "multi   internal\t\nwhitespace runs"),
    (6L, "dup dup dup dup dup dup"), // duplicate shingles
    (7L, "émoji ünïcode ∂ocument λx whitespace"),
    (8L, "short doc"), // < k tokens → dropped
    (9L, ""), // empty → dropped
    (10L, "exactly three tokens"))

  private def checkParity(portable: Boolean): Unit = {
    val df = edgeDocs.toDF("doc_id", "text")
    val got = Dedup.minHashSignaturesNarrow(df, k, nh, portableHashes = portable)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    val want = hofSigs(df, portable)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == want.keySet)
    assert(!got.contains(8L) && !got.contains(9L))
    got.foreach { case (id, sig) => assert(sig == want(id), s"doc $id") }
  }

  test("edge-case parity with the HOF formulation, portable md5 family") {
    checkParity(portable = true)
  }

  test("edge-case parity with the HOF formulation, xxhash64 family") {
    checkParity(portable = false)
  }

  /** The retired explode + partial-agg batch formulation, verbatim —
    * kept here as the shuffle-based independent reference now that
    * [[Dedup.minHashSignatures]] runs the compiled kernel. */
  private def explodeSigs(docs: DataFrame, portable: Boolean): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val sh = docs.select(col("doc_id").as("id"), explode(array_distinct(
        when(size(toks) >= k, transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array().cast(ArrayType(StringType))))).as("shingle"))
    val based = if (portable)
      sh.withColumn("__mhbase", pmod(Dedup.md5Hash60(col("shingle")), lit(MhPrime)))
    else sh
    def hash(i: Int) =
      if (portable) {
        val (a, b) = Dedup.mhCoeffs(i)
        pmod(lit(a) * col("__mhbase") + lit(b), lit(MhPrime))
      } else xxhash64(lit(i), col("shingle"))
    val aggs = (0 until nh).map(i => min(hash(i)).as(s"h$i"))
    based.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until nh).map(i => col(s"h$i")): _*).as("sig"))
  }

  test("corpus parity with the explode-form batch signatures, both families") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (portable <- Seq(true, false)) {
      val narrow = Dedup.minHashSignatures(docs, k, nh, portableHashes = portable)
        .select(col("id").cast(LongType), col("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      val batch = explodeSigs(docs, portable)
        .select(col("id").cast(LongType), col("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(narrow.keySet == batch.keySet, s"portable=$portable")
      narrow.foreach { case (id, sig) =>
        assert(sig == batch(id), s"portable=$portable doc $id") }
    }
  }
}
