package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.streaming.RspEngine.{ReportStrategy, OnWindowClose, NonEmptyContent, OnContentChange, Periodic}

/** Fluent programmatic query API over a QuadStore — the Spark rebuild of
  * the reference's `QueryBuilder` (`kolibrie/src/query_builder.rs:151-758`):
  * s/p/o filters (exact / contains / starts / ends / custom), cross-store
  * joins on a position, distinct, order_by, limit/offset, and terminal
  * getters. Everything stays a lazy DataFrame pipeline until a terminal
  * call, so Catalyst fuses the filter chain into the scan.
  *
  * The op chain is also kept as a replayable `DataFrame => DataFrame` so
  * [[QueryBuilder.asStream streaming mode]] can re-execute the SAME query
  * against each window's content (the reference's
  * `execute_query_on_window_content`, `query_builder.rs:560-628`).
  */
final class QueryBuilder private (store: QuadStore, private val df: DataFrame,
    private[model] val ops: DataFrame => DataFrame,
    private val windowSpec: Option[(Long, Long)] = None,
    private val reportStrategies: Seq[ReportStrategy] = Nil,
    private val tickEvery: Option[Int] = None,
    private val streamOp: Option[String] = None) {

  private def next(f: DataFrame => DataFrame) =
    new QueryBuilder(store, f(df), ops.andThen(f), windowSpec, reportStrategies, tickEvery, streamOp)
  private def conf(w: Option[(Long, Long)] = windowSpec,
      rs: Seq[ReportStrategy] = reportStrategies, te: Option[Int] = tickEvery,
      so: Option[String] = streamOp) =
    new QueryBuilder(store, df, ops, w, rs, te, so)

  // ---- positional filters (query_builder.rs:171-320) ----------------------
  def subject(v: String): QueryBuilder = next(_.filter(col("s") === v))
  def predicate(v: String): QueryBuilder = next(_.filter(col("p") === v))
  def obj(v: String): QueryBuilder = next(_.filter(col("o") === v))
  def subjectContains(v: String): QueryBuilder = next(_.filter(col("s").contains(v)))
  def predicateContains(v: String): QueryBuilder = next(_.filter(col("p").contains(v)))
  def objContains(v: String): QueryBuilder = next(_.filter(col("o").contains(v)))
  def subjectStartsWith(v: String): QueryBuilder = next(_.filter(col("s").startsWith(v)))
  def subjectEndsWith(v: String): QueryBuilder = next(_.filter(col("s").endsWith(v)))
  def objStartsWith(v: String): QueryBuilder = next(_.filter(col("o").startsWith(v)))
  def objEndsWith(v: String): QueryBuilder = next(_.filter(col("o").endsWith(v)))
  /** Custom predicate over (s,p,o) columns — the closure-filter analogue,
    * expressed as a Column so it stays in codegen. */
  def where(cond: (Column, Column, Column) => Column): QueryBuilder =
    next(_.filter(cond(col("s"), col("p"), col("o"))))
  def inGraph(g: String): QueryBuilder = next(_.filter(col("g") === g))
  def inDefaultGraph: QueryBuilder = next(_.filter(col("g").isNull))

  // ---- cross-store join (query_builder.rs:471-530) ------------------------
  /** Join with another builder's triples where this builder's `onLeft`
    * position equals the other's `onRight` position. Keeps this side's
    * triple columns plus the other side's as `s2/p2/o2`. */
  def join(other: QueryBuilder, onLeft: String = "o", onRight: String = "s"): QueryBuilder = {
    val r = other.df.select(col("s").as("s2"), col("p").as("p2"), col("o").as("o2"))
    val rightCol = onRight match { case "s" => "s2"; case "p" => "p2"; case _ => "o2" }
    next(_.join(r, col(onLeft) === col(rightCol), "inner"))
  }

  // ---- modifiers ----------------------------------------------------------
  def distinct(): QueryBuilder = next(_.dropDuplicates(Seq("s", "p", "o")))
  def orderBy(position: String, asc: Boolean = true): QueryBuilder =
    next(_.orderBy(if (asc) col(position).asc else col(position).desc))
  def limit(n: Int): QueryBuilder = next(_.limit(n))
  def offset(n: Int): QueryBuilder = next(_.offset(n))

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

  // ---- streaming mode (query_builder.rs:631-758) ---------------------------
  /** Configure a sliding window (width/slide in ms). */
  def window(widthMs: Long, slideMs: Long): QueryBuilder =
    conf(w = Some((widthMs, slideMs)))
  /** Append a report strategy; ALL configured strategies must pass. */
  def withReportStrategy(s: ReportStrategy): QueryBuilder =
    conf(rs = reportStrategies :+ s)
  /** Tuple-driven tick: evaluate after every n arrivals instead of on
    * time-driven window closes (`rsp/s2r.rs` Tick). */
  def withTupleTick(n: Int): QueryBuilder = conf(te = Some(n))
  /** R2S operator: "RSTREAM" | "ISTREAM" | "DSTREAM". */
  def withStreamOperator(op: String): QueryBuilder = conf(so = Some(op.toUpperCase))

  /** Enter streaming mode: requires a window; the current filter chain
    * becomes the per-window query (`query_builder.rs:662-679`). */
  def asStream(): StreamingQueryBuilder = windowSpec match {
    case Some((width, slide)) =>
      new StreamingQueryBuilder(store, ops, width, slide,
        if (reportStrategies.isEmpty) Seq(OnWindowClose) else reportStrategies,
        tickEvery, streamOp.getOrElse("RSTREAM"))
    case None => throw new IllegalStateException("No window configured for streaming.")
  }
}

/** Streaming QueryBuilder session (`query_builder.rs:681-758`): push
  * timestamped triples, drain per-window query results through the
  * configured R2S operator. Window mechanics mirror the RSP engine's S2R
  * (close = slide multiple; content = (close-width, close]). */
final class StreamingQueryBuilder(
    store: QuadStore,
    ops: DataFrame => DataFrame,
    widthMs: Long, slideMs: Long,
    reportStrategies: Seq[ReportStrategy],
    tickEvery: Option[Int],
    streamOp: String) {

  private val spark = store.spark
  private val events = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String)]
  private var firstEventTs: Option[Long] = None
  private var lastFiredClose: Option[Long] = None
  private val pendingCloses = scala.collection.mutable.ArrayBuffer.empty[Long]
  private var tupleCount = 0
  private var streaming = true
  private var fireCount = 0
  private var lastContentHash: Option[Int] = None
  private var lastEmitted: Set[(String, String, String)] = Set.empty
  private val allResults = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String, String)]]

  def isStreaming: Boolean = streaming

  def addStreamTriple(s: String, p: String, o: String, ts: Long): Unit = {
    require(streaming, "Query not in streaming mode. Call asStream() first.")
    // time-driven: the latest slide-aligned close strictly before the new
    // arrival becomes final (same rule as RspEngine.advance)
    val step = math.max(slideMs, 1L)
    val cMax = ((ts - 1) / step) * step
    if (firstEventTs.exists(f => cMax >= f) && lastFiredClose.forall(cMax > _)) {
      pendingCloses += cMax
      lastFiredClose = Some(cMax)
    }
    events += ((ts, s, p, o))
    if (firstEventTs.isEmpty) firstEventTs = Some(ts)
    tupleCount += 1
    if (tickEvery.exists(tupleCount % _ == 0)) pendingCloses += ts
  }

  /** Drain fired windows: run the builder's op chain over each window's
    * content, apply the R2S operator, return per-window result batches. */
  def getStreamResults(): Seq[Seq[(String, String, String)]] = {
    if (!streaming) return Nil
    val out = pendingCloses.toSeq.flatMap { close =>
      val lo = close - widthMs
      val content = events.filter { case (t, _, _, _) => t > lo && t <= close }
        .map { case (_, s, p, o) => (s, p, o) }.toSeq
      fireCount += 1
      val contentHash = content.toSet.hashCode()
      val passes = reportStrategies.forall {
        case OnWindowClose => true
        case NonEmptyContent => content.nonEmpty
        case OnContentChange => !lastContentHash.contains(contentHash)
        case Periodic(n) => fireCount % math.max(n, 1) == 0
      }
      lastContentHash = Some(contentHash)
      if (!passes) None
      else {
        val windowStore = QuadStore.fromTriples(spark, content)
        val rows = ops(windowStore.quads).select("s", "p", "o").collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
        val current = rows.toSet
        val emittedRows = streamOp match {
          case "ISTREAM" => (current -- lastEmitted).toSeq.sorted
          case "DSTREAM" => (lastEmitted -- current).toSeq.sorted
          case _ => rows
        }
        lastEmitted = current
        // empty result batches are not pushed (`query_builder.rs:718-730`)
        if (emittedRows.nonEmpty) Some(emittedRows) else None
      }
    }
    pendingCloses.clear()
    allResults ++= out
    out
  }

  def getAllStreamResults: Seq[Seq[(String, String, String)]] = allResults.toSeq
  def clearStreamResults(): Unit = allResults.clear()
  def stopStream(): Unit = streaming = false
}

object QueryBuilder {
  def apply(store: QuadStore): QueryBuilder =
    new QueryBuilder(store, store.quads, identity)
}
