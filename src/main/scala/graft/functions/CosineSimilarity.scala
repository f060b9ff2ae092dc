package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native codegen cosine similarity over two numeric arrays.
  *
  * The pipeline operators' hot path (brute-force top-k, IVF assign/probe,
  * embedding near-dup) previously computed cosine via
  * `aggregate(zip_with(...))` higher-order functions — interpreted
  * per-element lambda calls that sit outside whole-stage codegen's fused
  * loop. This expression compiles to one static call accumulating
  * dot(a,b), dot(a,a), dot(b,b) in a single pass.
  *
  * Semantics match the HOF formulation bitwise: each accumulator is the
  * same left-to-right double summation the sequential `aggregate` fold
  * produces (IEEE addition order preserved), so DuckDB-oracle parity via
  * `list_dot_product` is unchanged. Length mismatch or a null element
  * yields null, as zip_with's null-padding did.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemTag(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemTag(left) >= 0 && elemTag(right) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric arrays, got ${left.dataType} and ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cosineOrNull(a.asInstanceOf[ArrayData], elemTag(left),
      b.asInstanceOf[ArrayData], elemTag(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSimilarity.cosineOrNull(
         |  $a, ${elemTag(left)}, $b, ${elemTag(right)});
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Static kernel shared by interpreted and generated code. Tags:
    * 0=float, 1=double, 2=int, 3=long element types. */
  def cosineOrNull(x: ArrayData, xt: Int, y: ArrayData, yt: Int): java.lang.Double = {
    if (x == null || y == null) return null
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dotAB = 0.0
    var dotAA = 0.0
    var dotBB = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val a = get(x, i, xt)
      val b = get(y, i, yt)
      dotAB += a * b
      dotAA += a * a
      dotBB += b * b
      i += 1
    }
    java.lang.Double.valueOf(dotAB / math.sqrt(dotAA * dotBB))
  }

  private def get(arr: ArrayData, i: Int, tag: Int): Double = tag match {
    case 0 => arr.getFloat(i).toDouble
    case 1 => arr.getDouble(i)
    case 2 => arr.getInt(i).toDouble
    case _ => arr.getLong(i).toDouble
  }

  /** The ONE SQL builder both registration routes (per-session
    * register(), [[graft.GraftExtensions]]) resolve through — arity
    * errors surface as a clear message, not an analyzer index crash. */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"cosine_sim expects 2 arguments (a, b), got ${exprs.size}")
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Idempotent session registration (the public route to the Expression
    * as a Column, same pattern as [[QtComponent.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", builder, "built-in")

  def apply(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
