package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch as a native Catalyst aggregate
  * (Flajolet, Fusy, Gandouet & Meunier 2007), the constant-memory
  * companion of [[KmvDistinct]]: state is m = 2^p one-byte registers
  * regardless of input size, two sketches merge by element-wise max, so
  * Spark's partial aggregation ships m bytes per group per partition
  * where KMV ships 8k. Registers are max-aggregates of a pure function
  * of the hash — encounter order never matters, the sketch is exactly as
  * deterministic as KMV.
  *
  * Portable-arithmetic formulation (every step reproducible in ANSI SQL
  * from the same md5-60 hashes, so the estimate itself hash-checks):
  *   j   = h mod m                 (low p bits — register index)
  *   w   = h div m                 (high domainBits − p bits)
  *   ρ   = R − bitlength(w)        (leading zeros of w + 1; ρ(0) = R,
  *                                  where R = domainBits − p + 1)
  *   M_j = max ρ per register
  * The harmonic indicator Σ_j 2^(−M_j) is rescaled by 2^R so every term
  * 2^(R − M_j) is an exact BIGINT (sum ≤ m·2^R = 2^(domainBits+1), so
  * domainBits ≤ 61 can never overflow) — the float division happens
  * once, on exact integers, instead of per-register:
  *   E_raw = α_m · m² · 2^R / S        α_m = 0.7213/(1 + 1.079/m)
  * with the standard small-range fallback to linear counting over the
  * V empty registers (E_raw ≤ 2.5m ∧ V > 0 → m·ln(m/V)); the 2^32
  * large-range correction is meaningless in a 60-bit hash domain and is
  * omitted. Relative error ≈ 1.04/√m.
  *
  * Beyond-reference operator (the reference has no sketches); registers
  * as `hll_distinct(hashCol, p[, domainBits])`.
  */
final case class HllDistinct(child: Expression, p: Int, domainBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(p >= 7 && p <= 16,
    s"hll_distinct needs p in [7, 16] (the alpha constant below assumes m >= 128), got $p")
  require(domainBits > p && domainBits <= 61,
    s"hll_distinct domainBits must be in (p, 61], got $domainBits")

  private val m: Int = 1 << p
  /** Max possible rank: all domainBits − p suffix bits zero. */
  private val maxRho: Int = domainBits - p + 1

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG hash column, got $other")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0 || (h >>> domainBits) != 0) throw new IllegalArgumentException(
        s"hll_distinct input hash $h is outside [0, 2^$domainBits) — hash with " +
          "md5Hash60 (domainBits=60) or mask into the declared domain")
      val j = (h & (m - 1)).toInt          // h mod m: low p bits
      val w = h >>> p                       // h div m: high bits
      val rho = (maxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buf(j)) buf(j) = rho        // rho(0) = maxRho via nlz(0) = 64
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L      // Σ 2^(R − M_j), exact
    var v = 0       // empty registers
    var j = 0
    while (j < m) {
      s += 1L << (maxRho - buf(j))
      if (buf(j) == 0) v += 1
      j += 1
    }
    // identical op chains to the SQL oracle: left-to-right, no folding
    val raw = 0.7213 / (1.0 + 1.079 / m.toDouble) * m * m *
      java.lang.Math.pow(2.0, maxRho) / s.toDouble
    if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v) else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

object HllDistinct {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"hll_distinct $what must be an integer literal, got $other")
  }

  /** The ONE SQL builder both registration routes resolve through —
    * holds the domainBits default (60, the md5-60 domain) in exactly
    * one place (see [[CosineSimilarity.builder]]). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2 || exprs.size == 3,
      s"hll_distinct expects (hash, p[, domainBits]), got ${exprs.size} arguments")
    HllDistinct(exprs(0), intArg(exprs(1), "p"),
      if (exprs.size > 2) intArg(exprs(2), "domainBits") else 60)
  }

  /** Idempotent session registration ([[CosineSimilarity.register]]
    * pattern); the analyzer wraps the returned AggregateFunction. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct", builder, "built-in")

  /** hll_distinct(hash, p) over the md5-60 domain. */
  def apply(hash: Column, p: Int): Column = apply(hash, p, domainBits = 60)

  /** hll_distinct(hash, p) over a caller-declared hash domain
    * [0, 2^domainBits). */
  def apply(hash: Column, p: Int, domainBits: Int): Column =
    call_function("hll_distinct", hash,
      org.apache.spark.sql.functions.lit(p),
      org.apache.spark.sql.functions.lit(domainBits))
}
