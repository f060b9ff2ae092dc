package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * step of corpus text canonicalization (decomposed é vs precomposed é,
  * full/compat forms carried through crawls) so that downstream exact
  * dedup, shingling, and tokenization see ONE byte representation per
  * canonically-equal string. Spark has no built-in normalizer; a Scala
  * UDF would drop the column out of whole-stage codegen and hide
  * nullability from the optimizer, so this is an `Expression` with
  * `doGenCode` like [[CosineSimilarity]].
  *
  * The fast path: `Normalizer.isNormalized` is O(n) with no allocation
  * and true for the overwhelming majority of real corpus text (ASCII is
  * trivially NFC), so the common case never materializes a new string —
  * the input UTF8String is returned as-is.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalize.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by interpreted and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1,
      s"nfc_normalize expects 1 argument (text), got ${exprs.size}")
    NfcNormalize(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", builder, "built-in")

  def apply(c: Column): Column = call_function("nfc_normalize", c)

  /** Registry-free Column construction — for library-internal use where
    * mutating the session's temp-function registry as a side effect of
    * building a Column would be surprising ([[graft.pipeline.TextAnalysis.unicodeClean]]). */
  def ofColumn(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
