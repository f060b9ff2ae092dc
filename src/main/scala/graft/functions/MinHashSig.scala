package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE native expression:
  * text → `numHashes` minimums over the doc's k-token shingles, i.e.
  * exactly what `array(array_min(transform(shingles, h_i)) for i)` + the
  * shingleArray/tokens column combinators compute — but as a compiled
  * kernel instead of `numHashes × |shingles|` interpreted higher-order
  * lambda evaluations. Measured on the streaming replay corpus
  * (sf0.1, 5000 docs, 32 hashes, portable md5 family): the HOF
  * formulation costs ~7.5 ms/doc on one core — 37 s single-partition,
  * and the dominant per-micro-batch cost of `dedup_minhash_stream` —
  * vs ~0.07 ms/doc here. The batch leg keeps its explode + partial-agg
  * plan ([[graft.pipeline.Dedup.minHashSignatures]]); this expression
  * exists for the narrow/stateless contexts (streaming selects, no-new-
  * exchange pipelines) where aggregation is unavailable by design.
  *
  * Both hash families reproduce the Column formulations bit-for-bit
  * (parity is spec-pinned against the Column path and, for the portable
  * family, hash-checked end-to-end by the `dedup_minhash_stream` DuckDB
  * oracle):
  *  - portable: md5-60 base (first 15 hex digits of md5, parsed base
  *    16) mod p = 2³¹−1, then h_i = (a_i·base + b_i) mod p with the
  *    shared md5-derived coefficients;
  *  - default: `xxhash64(lit(i), shingle)` = XXH64 with the per-seed
  *    prefix `hashInt(i, 42)` folded over the shingle's UTF-8 bytes
  *    (the per-seed prefixes are precomputed once).
  * Tokenization matches `tokens()` exactly: SQL `trim` strips 0x20
  * only (NOT Java trim's ≤0x20), and the split keeps trailing empty
  * strings (Java `Pattern.split(s, -1)`) the way Spark's `split` does.
  * Shingle duplicates need no dedup — minimums are multiset-invariant.
  *
  * Docs with fewer than k tokens return an EMPTY array (the column
  * pipeline's `shingleArray` shape); callers filter `size(sig) > 0`.
  * Null text → null. */
final case class MinHashSig(child: Expression, k: Int, numHashes: Int,
    portable: Boolean) extends UnaryExpression {
  // construction-time guards matching ShingleArray/ShingleHashes: the
  // expression is SQL-exposed (minhash_sig via GraftExtensions), where
  // k=0 would quietly hash empty-string shingles and numHashes<=0 would
  // return an empty sig the size filter then drops (ADVICE r7)
  require(k >= 1, "k must be >= 1")
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    MinHashSig.sig(s.asInstanceOf[UTF8String], k, numHashes, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.MinHashSig.sig($s, $k, $numHashes, $portable)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val MhPrime = 2147483647L // 2^31 − 1, shared with Dedup.MhPrime

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  // (a_i, b_i) universal-hash coefficients and xxhash64 per-seed
  // prefixes, computed once per numHashes
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private val xxPrefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]

  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes, { n =>
      val pairs = (0 until n).map(graft.pipeline.Dedup.mhCoeffs)
      (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
    })

  private def xxPrefixes(numHashes: Int): Array[Long] =
    xxPrefixCache.computeIfAbsent(numHashes,
      n => Array.tabulate(n)(i => XXH64.hashInt(i, 42L)))

  /** Static kernel shared by interpreted and generated code. */
  def sig(u: UTF8String, k: Int, numHashes: Int, portable: Boolean): ArrayData = {
    val toks = TextTok.tokens(u)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    if (portable) {
      val (as, bs) = coeffs(numHashes)
      val md = md5Local.get()
      var i = 0
      while (i <= n - k) {
        sb.setLength(0)
        var t = i
        while (t < i + k) {
          if (t > i) sb.append(' ')
          sb.append(toks(t)); t += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex digits = first 60 bits of the digest
        val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
          ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
          ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
          ((d(6) & 0xffL) << 4) | ((d(7) >> 4) & 0xfL)
        val base = h60 % MhPrime
        var j = 0
        while (j < numHashes) {
          val v = (as(j) * base + bs(j)) % MhPrime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
    } else {
      val pre = xxPrefixes(numHashes)
      var i = 0
      while (i <= n - k) {
        sb.setLength(0)
        var t = i
        while (t < i + k) {
          if (t > i) sb.append(' ')
          sb.append(toks(t)); t += 1
        }
        val sh = UTF8String.fromString(sb.toString)
        var j = 0
        while (j < numHashes) {
          val v = XXH64.hashUTF8String(sh, pre(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Registry-free Column construction (library-internal use). */
  def ofColumn(text: Column, k: Int, numHashes: Int, portable: Boolean): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        k, numHashes, portable))

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"minhash_sig $what must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"minhash_sig $what must be a boolean literal, got $other")
  }

  /** The ONE SQL builder both registration routes resolve through
    * ([[KmvDistinct.builder]] pattern): minhash_sig(text[, k[,
    * numHashes[, portable]]]) with the Dedup-wide defaults. */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.nonEmpty && exprs.size <= 4,
      s"minhash_sig expects (text[, k[, numHashes[, portable]]]), got ${exprs.size} arguments")
    MinHashSig(exprs.head,
      if (exprs.size > 1) intArg(exprs(1), "k") else 3,
      if (exprs.size > 2) intArg(exprs(2), "numHashes") else 32,
      if (exprs.size > 3) boolArg(exprs(3), "portable") else false)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", builder, "built-in")
}
