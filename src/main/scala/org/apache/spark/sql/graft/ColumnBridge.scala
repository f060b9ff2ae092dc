package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Registry-free Expression ⇄ Column conversion. Spark 4 made the Column
  * constructor private — the supported public route is the session
  * function registry (`call_function`), but mutating the registry as a
  * side effect of building a Column is wrong for pure combinators like
  * `TextAnalysis.unicodeClean`. `ExpressionUtils` is `private[sql]`, so
  * this one-file bridge in the sql namespace re-exports the two
  * conversions (the conventional extension-point technique for Spark
  * libraries shipping native expressions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
