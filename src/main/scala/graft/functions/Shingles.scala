package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared tokenizer for the compiled text kernels ([[MinHashSig]],
  * [[ShingleArray]], [[ShingleHashes]]) — bit-compatible with the
  * `tokens()` column combinator: SQL `trim` strips 0x20 only (NOT Java
  * trim's ≤ 0x20), and the `\s+` split keeps trailing empty strings the
  * way Spark's `split` does (`Pattern.split(s, -1)`). */
private[functions] object TextTok {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def sqlTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  def tokens(u: UTF8String): Array[String] = ws.split(sqlTrim(u.toString), -1)

  /** Distinct k-token shingles in FIRST-OCCURRENCE order — exactly
    * `array_distinct(transform(sequence(0, n−k), i → concat_ws(" ",
    * slice(toks, i+1, k))))`: Spark's array_distinct also keeps the
    * first occurrence. Empty for docs with fewer than k tokens. */
  def distinctShingles(u: UTF8String, k: Int): Array[String] = {
    val toks = tokens(u)
    val n = toks.length
    if (n < k) return Array.empty
    val seen = new java.util.LinkedHashSet[String]((n - k + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var t = i
      while (t < i + k) {
        if (t > i) sb.append(' ')
        sb.append(toks(t)); t += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }
}

/** Distinct k-token shingle strings per row as ONE compiled kernel —
  * the per-row form of [[graft.pipeline.Dedup.shingles]]'s array build,
  * replacing a nested interpreted higher-order chain
  * (transform → concat_ws → slice per shingle, then array_distinct)
  * with a single tokenize + join + LinkedHashSet pass. Same distinct
  * set, same first-occurrence order, same empty-below-k shape; null
  * text → null (consumers explode or size-filter, where null and empty
  * behave identically). */
final case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    ShingleArray.build(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ShingleArray.build($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  /** Static kernel shared by interpreted and generated code. NOT named
    * `eval`: the case class inherits `Expression.eval`, and a companion
    * method sharing a class member's name gets NO static forwarder —
    * Janino then resolves the generated call to the instance method and
    * the whole projection silently falls back to interpreted mode. */
  def build(u: UTF8String, k: Int): ArrayData = {
    val sh = TextTok.distinctShingles(u, k)
    val out = new Array[AnyRef](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  def ofColumn(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleArray(org.apache.spark.sql.graft.ColumnBridge.expression(text), k))
}

/** xxhash64 of each distinct k-token shingle, per row — bit-identical
  * to `transform(shingle_array, s → xxhash64(s))` (seed-42 XXH64 over
  * the shingle's UTF-8 bytes, first-occurrence order preserved) without
  * the interpreted per-element lambda. This is [[
  * graft.pipeline.Dedup.prefixJaccardPairs]]'s in-row posting builder:
  * its stage decomposition attributed ~2.5 s of the sf0.1 entry to the
  * tokenize+hash+checkpoint stage, almost all of it lambda eval. */
final case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    ShingleHashes.hashes(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ShingleHashes.hashes($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Static kernel shared by interpreted and generated code (named
    * `hashes`, not `eval` — see [[ShingleArray.build]]). */
  def hashes(u: UTF8String, k: Int): ArrayData = {
    val sh = TextTok.distinctShingles(u, k)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      out(i) = XXH64.hashUTF8String(UTF8String.fromString(sh(i)), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def ofColumn(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.graft.ColumnBridge.expression(text), k))
}
