package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Keep the elements of an `Array[Long]` column that are members of a
  * broadcast SORTED `long[]` vocabulary (binary search per element) —
  * the broadcast-membership kernel of
  * [[graft.pipeline.Dedup.containmentPairs]]'s filter-then-explode plan.
  *
  * There is no clean Catalyst built-in for a multi-million-element
  * broadcast membership test (`array_intersect` against a literal array
  * embeds the vocabulary in the PLAN — task-binary bloat and a per-task
  * deserialize — and a join is exactly the corpus-sized row expansion
  * the caller is avoiding). The r10 form was a Scala UDF over
  * `Seq[Long]`, which boxes every element on the way in and out; this
  * expression stays primitive end-to-end: `ArrayData.toLongArray` in,
  * `UnsafeArrayData.fromPrimitiveArray` out, codegen'd call in the
  * middle. The broadcast HANDLE serializes with the expression; the
  * vocabulary itself ships once per executor via the broadcast plane. */
final case class SortedVocabFilter(child: Expression,
    vocab: Broadcast[Array[Long]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_vocab_filter"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(arr: Any): Any =
    SortedVocabFilter.keep(arr.asInstanceOf[ArrayData], vocab.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabBc", vocab,
      classOf[Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.SortedVocabFilter.keep($arr, (long[])$ref.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedVocabFilter =
    copy(child = newChild)
}

object SortedVocabFilter {
  /** Static kernel shared by interpreted and generated code (named
    * `keep`, not `eval` — see [[ShingleArray.build]] for the Janino
    * static-forwarder trap). Unboxed throughout. */
  def keep(arr: ArrayData, vocab: Array[Long]): ArrayData = {
    val in = arr.toLongArray()
    val tmp = new Array[Long](in.length)
    var n = 0
    var i = 0
    while (i < in.length) {
      val h = in(i)
      if (java.util.Arrays.binarySearch(vocab, h) >= 0) { tmp(n) = h; n += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (n == in.length) tmp else java.util.Arrays.copyOf(tmp, n))
  }

  def ofColumn(arr: Column, vocab: Broadcast[Array[Long]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedVocabFilter(org.apache.spark.sql.graft.ColumnBridge.expression(arr), vocab))
}
