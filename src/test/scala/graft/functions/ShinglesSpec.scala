package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bit parity of the compiled shingle kernels against the Column chain
  * they replaced — distinct SET, first-occurrence ORDER, and (for
  * [[ShingleHashes]]) the exact seed-42 xxhash64 values — on
  * whitespace/unicode/duplicate corners and the real corpus. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3

  /** The retired column formulation, verbatim. */
  private def hofShingleArray(textCol: String): org.apache.spark.sql.Column = {
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    array_distinct(when(n >= k,
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast(ArrayType(StringType))))
  }

  private val edgeDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  leading and trailing spaces   "),
    (3L, "\ttab keeps an empty first token here"),
    (4L, "trailing tab keeps an empty last token\t"),
    (5L, "dup dup dup dup dup dup"), // duplicate shingles collapse, order kept
    (6L, "émoji ünïcode ∂ocument λx whitespace"),
    (7L, "short doc"), (8L, ""), (9L, "exactly three tokens"))

  test("shingle_array: set AND order equal the column chain on edge cases") {
    val df = edgeDocs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        ShingleArray.ofColumn(col("text"), k).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val want = df.select(col("doc_id"), hofShingleArray("text").as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, sh) => assert(sh == want(id), s"doc $id") }
    assert(got(7L).isEmpty && got(8L).isEmpty)
    assert(got(5L).size < 4, "duplicates did not collapse")
  }

  test("shingle_hashes ≡ transform(shingle_array, xxhash64) on edges + corpus") {
    def check(df: DataFrame): Unit = {
      val got = df.select(col("doc_id").cast(LongType),
          ShingleHashes.ofColumn(col("text"), k).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = df.select(col("doc_id").cast(LongType),
          transform(hofShingleArray("text"), s => xxhash64(s)).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, h) => assert(h == want(id), s"doc $id") }
    }
    check(edgeDocs.toDF("doc_id", "text"))
    check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
  }

  test("shingles() explode form matches the kernel-backed rebuild") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = graft.pipeline.Dedup.shingles(docs, k)
      .as[(Long, String)].collect().toSet
    val want = docs.select(col("doc_id").cast(LongType).as("id"),
        explode(hofShingleArray("text")).as("shingle"))
      .as[(Long, String)].collect().toSet
    assert(got == want)
  }
}
