package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent programmatic query API over a QuadStore — the Spark rebuild of
  * the reference's `QueryBuilder` (`kolibrie/src/query_builder.rs:151-758`):
  * s/p/o filters (exact / contains / starts / ends / custom), cross-store
  * joins on a position, distinct, order_by, limit/offset, and terminal
  * getters. Everything stays a lazy DataFrame pipeline until a terminal
  * call, so Catalyst fuses the filter chain into the scan.
  */
final class QueryBuilder private (store: QuadStore, private val df: DataFrame) {

  private def next(d: DataFrame) = new QueryBuilder(store, d)

  // ---- positional filters (query_builder.rs:171-320) ----------------------
  def subject(v: String): QueryBuilder = next(df.filter(col("s") === v))
  def predicate(v: String): QueryBuilder = next(df.filter(col("p") === v))
  def obj(v: String): QueryBuilder = next(df.filter(col("o") === v))
  def subjectContains(v: String): QueryBuilder = next(df.filter(col("s").contains(v)))
  def predicateContains(v: String): QueryBuilder = next(df.filter(col("p").contains(v)))
  def objContains(v: String): QueryBuilder = next(df.filter(col("o").contains(v)))
  def subjectStartsWith(v: String): QueryBuilder = next(df.filter(col("s").startsWith(v)))
  def subjectEndsWith(v: String): QueryBuilder = next(df.filter(col("s").endsWith(v)))
  def objStartsWith(v: String): QueryBuilder = next(df.filter(col("o").startsWith(v)))
  def objEndsWith(v: String): QueryBuilder = next(df.filter(col("o").endsWith(v)))
  /** Custom predicate over (s,p,o) columns — the closure-filter analogue,
    * expressed as a Column so it stays in codegen. */
  def where(cond: (Column, Column, Column) => Column): QueryBuilder =
    next(df.filter(cond(col("s"), col("p"), col("o"))))
  def inGraph(g: String): QueryBuilder = next(df.filter(col("g") === g))
  def inDefaultGraph: QueryBuilder = next(df.filter(col("g").isNull))

  // ---- cross-store join (query_builder.rs:471-530) ------------------------
  /** Join with another builder's triples where this builder's `onLeft`
    * position equals the other's `onRight` position. Keeps this side's
    * triple columns plus the other side's as `s2/p2/o2`. */
  def join(other: QueryBuilder, onLeft: String = "o", onRight: String = "s"): QueryBuilder = {
    val r = other.df.select(col("s").as("s2"), col("p").as("p2"), col("o").as("o2"))
    val rightCol = onRight match { case "s" => "s2"; case "p" => "p2"; case _ => "o2" }
    next(df.join(r, col(onLeft) === col(rightCol), "inner"))
  }

  // ---- modifiers ----------------------------------------------------------
  def distinct(): QueryBuilder = next(df.dropDuplicates(Seq("s", "p", "o")))
  def orderBy(position: String, asc: Boolean = true): QueryBuilder =
    next(df.orderBy(if (asc) col(position).asc else col(position).desc))
  def limit(n: Int): QueryBuilder = next(df.limit(n))
  def offset(n: Int): QueryBuilder = next(df.offset(n))

  // ---- terminals (query_builder.rs:531-700) -------------------------------
  def toDF: DataFrame = df
  def getTriples: Seq[(String, String, String)] =
    df.select("s", "p", "o").collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
  def getSubjects: Seq[String] = df.select("s").distinct().collect().map(_.getString(0)).toSeq
  def getPredicates: Seq[String] = df.select("p").distinct().collect().map(_.getString(0)).toSeq
  def getObjects: Seq[String] = df.select("o").distinct().collect().map(_.getString(0)).toSeq
  def count(): Long = df.count()
  def groupByPosition(position: String): DataFrame =
    df.groupBy(col(position))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
}

object QueryBuilder {
  def apply(store: QuadStore): QueryBuilder =
    new QueryBuilder(store, store.quads)
}
