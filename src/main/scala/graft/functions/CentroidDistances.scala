package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Integer-L2 distances of one embedding row against a small centroid
  * matrix on the micro-unit grid — the compiled kernel behind the
  * portable k-means family ([[graft.pipeline.Similarity.kmeansMicro]]
  * and its consumers).
  *
  * Semantics (bit-identical to the exploded-join SQL formulation it
  * replaces, which the DuckDB oracles replay):
  *   xq_j  = floor(v_j · 10⁶) as BIGINT   (the micro-unit quantization)
  *   d2_c  = Σ_j (xq_j − cent_c_j)²       (exact BIGINT arithmetic)
  * returning `array<long>` with index = cid (so `array_position(d2s,
  * array_min(d2s)) − 1` is the classic argmin with ties to the LOWEST
  * cid — the same (d2, cid) tie-break as the old
  * `min_by(cid, struct(d2, cid))`).
  *
  * Why a kernel: the former path exploded every vector into (id, pos,
  * xq) rows and shuffled an n·dim table through a broadcast join + two
  * aggregations PER CONSUMER (assignment, probing, encoding). The
  * centroid matrix is model-sized (k·dim ≤ a few thousand longs), so
  * passing it as a plan constant turns nearest-centroid assignment into
  * a zero-shuffle projection fused into whole-stage codegen — at any
  * corpus size the assignment stage becomes one narrow scan
  * (optimization-guide §2.4 "remove shuffles outright" + §4 "built-in /
  * compiled expressions in the hot path").
  *
  * `offset`/`length` select a contiguous component slice (PQ subspaces:
  * offset = m·dsub, length = dsub); length −1 means the whole vector.
  * `base` optionally supplies a residual base (the assigned coarse
  * centroid, as micro-unit longs aligned with the slice): distances are
  * then Σ ((xq_j − base_j) − cent_c_j)² — the IVF-PQ residual form.
  * A null input (or null element, or a base/slice length mismatch)
  * yields null, like the zip_with/aggregate HOF chain it replaces.
  */
final case class CentroidDistances(child: Expression,
    cents: Array[Array[Long]], offset: Int = 0, length: Int = -1)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_d2s"

  private def elemTag(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemTag(child) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array, got ${child.dataType}")

  // the matrix rides into generated code as a referenced object, exactly
  // like any codegen constant; equality stays reference-based (safe:
  // missed subexpression reuse at worst, never wrong results)
  override def nullSafeEval(v: Any): Any =
    CentroidDistances.d2sOrNull(v.asInstanceOf[ArrayData], elemTag(child),
      cents, offset, length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.CentroidDistances.d2sOrNull(
         |    $v, ${elemTag(child)}, $mref, $offset, $length);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDistances =
    copy(child = newChild)
}

object CentroidDistances {

  /** Static kernel shared by interpreted and generated code. Tags:
    * 0=float, 1=double, 2=int, 3=long element types (long = already on
    * the micro grid, no re-quantization). */
  def d2sOrNull(x: ArrayData, xt: Int, cents: Array[Array[Long]],
      offset: Int, length: Int): ArrayData = {
    if (x == null) return null
    val n = x.numElements()
    val len = if (length < 0) n else length
    if (offset + len > n) return null
    val k = cents.length
    // quantize the slice once, reuse across all k centroids
    val xq = new Array[Long](len)
    var j = 0
    while (j < len) {
      if (x.isNullAt(offset + j)) return null
      xq(j) = xt match {
        case 0 => Math.floor(x.getFloat(offset + j).toDouble * 1000000.0).toLong
        case 1 => Math.floor(x.getDouble(offset + j) * 1000000.0).toLong
        case 2 => Math.floor(x.getInt(offset + j).toDouble * 1000000.0).toLong
        case _ => x.getLong(offset + j) // already micro-units
      }
      j += 1
    }
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      if (cv.length != len) return null
      var d2 = 0L
      var i = 0
      while (i < len) {
        val d = xq(i) - cv(i)
        d2 += d * d
        i += 1
      }
      out(c) = d2
      c += 1
    }
    new GenericArrayData(out)
  }

  /** d2 array against `cents` — registry-free `Column` wrapper. */
  def apply(vec: Column, cents: Array[Array[Long]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(CentroidDistances(
      org.apache.spark.sql.graft.ColumnBridge.expression(vec), cents))

  /** Subspace form: distances over `length` components starting at
    * `offset` (PQ codebook lookups). */
  def slice(vec: Column, cents: Array[Array[Long]], offset: Int, length: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(CentroidDistances(
      org.apache.spark.sql.graft.ColumnBridge.expression(vec), cents, offset, length))
}
