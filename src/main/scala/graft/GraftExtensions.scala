package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, KmvDistinct, QtComponent}

/** Session-extensions entry point: installs graft's native Catalyst
  * functions at session BUILD time via
  * `--conf spark.sql.extensions=graft.GraftExtensions`, the idiomatic
  * deployment route for a Spark library (no per-session register()
  * calls, works from pure-SQL clients like Thrift/Connect, survives in
  * every new session of the cluster).
  *
  * The per-session `X.register(spark)` helpers remain for programmatic
  * use; both routes resolve to the same Expression classes, so plans and
  * results are identical. ExtensionsSpec drives a fresh session through
  * this class and cross-checks against the register() route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))

    Seq("qt_subject" -> 0, "qt_predicate" -> 1, "qt_object" -> 2).foreach {
      case (n, i) =>
        ext.injectFunction((FunctionIdentifier(n),
          info(n, s"$n(t) - the ${Seq("subject", "predicate", "object")(i)} " +
            "of a quoted RDF-star triple"),
          (exprs: Seq[Expression]) => QtComponent(exprs.head, i)))
    }

    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(hash, k[, domainBits]) - KMV distinct-count sketch"),
      (exprs: Seq[Expression]) => KmvDistinct(exprs(0),
        intArg(exprs(1), "kmv_distinct", "k"),
        if (exprs.size > 2) intArg(exprs(2), "kmv_distinct", "domainBits")
        else 60)))
  }
}
