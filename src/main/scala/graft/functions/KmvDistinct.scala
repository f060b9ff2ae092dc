package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate (Bar-Yossef et al. 2002; the estimator behind Theta
  * sketches). State is the k smallest DISTINCT hash values seen — O(k)
  * per group regardless of input size — and two sketches merge by
  * keeping the k smallest of their union, so Spark's partial
  * aggregation (map-side update, reduce-side merge) is the natural
  * execution: a 100 TB scan ships only k longs per group per partition.
  *
  * Estimate: exact |set| while fewer than k distinct values were seen
  * (nothing was ever evicted), else `(k-1) · domain / h_(k)` where
  * h_(k) is the k-th smallest hash and `domain` the hash range — the
  * standard unbiased KMV estimator with relative error ≈ 1/√(k−2).
  *
  * The input is an already-hashed NON-NEGATIVE long (caller picks
  * [[graft.pipeline.Dedup.md5Hash60]] for engine portability — then the
  * whole sketch, including the estimate, is bit-reproducible in DuckDB
  * from the k-th smallest distinct hash — or, for speed,
  * `xxhash64(...).bitwiseAND(Long.MaxValue)` with domainBits = 63; raw
  * xxhash64 is signed and a negative value is rejected at update time
  * rather than silently corrupting the estimator).
  * Deterministic by construction: the k smallest of a multiset do not
  * depend on encounter order, unlike HLL register races.
  *
  * Beyond-reference operator (the reference has no sketches); the
  * aggregate registers as `kmv_distinct(hashCol, k, domainBits)`.
  */
final case class KmvDistinct(child: Expression, k: Int, domainBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")
  require(domainBits >= 1 && domainBits <= 63,
    s"kmv_distinct domainBits must be in [1, 63], got $domainBits")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG hash column, got $other")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator() // ascending; stop once nothing can enter
    var open = true
    while (open && it.hasNext) open = insert(buf, it.next())
    buf
  }

  /** True if the value entered the sketch (or a smaller one still
    * could); false signals an ascending caller it may stop. */
  private def insert(buf: java.util.TreeSet[java.lang.Long], v0: Long): Boolean = {
    if (v0 < 0) throw new IllegalArgumentException(
      s"kmv_distinct input hash $v0 is negative — mask the hash into the " +
        "declared domain (e.g. xxhash64(c) & Long.MaxValue with domainBits=63)")
    val v: java.lang.Long = v0
    if (buf.size < k) { buf.add(v); true }
    else if (v0 < buf.last()) {
      if (buf.add(v)) buf.pollLast()
      true
    } else false
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * math.pow(2.0, domainBits) / buf.last().doubleValue()

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"kmv_distinct $what must be an integer literal, got $other")
  }

  /** The ONE SQL builder both registration routes resolve through —
    * holds the domainBits default (60, the md5-60 domain) in exactly
    * one place (see [[CosineSimilarity.builder]]). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2 || exprs.size == 3,
      s"kmv_distinct expects (hash, k[, domainBits]), got ${exprs.size} arguments")
    KmvDistinct(exprs(0), intArg(exprs(1), "k"),
      if (exprs.size > 2) intArg(exprs(2), "domainBits") else 60)
  }

  /** Idempotent session registration ([[CosineSimilarity.register]]
    * pattern); the analyzer wraps the returned AggregateFunction. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct", builder, "built-in")

  /** kmv_distinct(hash, k) over the md5-60 domain. */
  def apply(hash: Column, k: Int): Column = apply(hash, k, domainBits = 60)

  /** kmv_distinct(hash, k) over a caller-declared hash domain
    * [0, 2^domainBits) — 63 for sign-masked xxhash64. */
  def apply(hash: Column, k: Int, domainBits: Int): Column =
    call_function("kmv_distinct", hash,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(domainBits))
}
