package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RSP-QL window + R2S operators rebuilt on Spark's time-window semantics
  * (SURVEY §2.9).
  *
  * S2R: the reference's CSPARQL sliding window `[RANGE w STEP s]` opens
  * every window covering an event (`rsp/s2r.rs:298-330` `scope()`); Spark's
  * `window(ts, w, s)` assigns each event to exactly the same ⌈w/s⌉
  * windows, so the mapping is 1:1. These helpers work identically on batch
  * and streaming DataFrames — the streaming path adds `withWatermark`
  * upstream and the R2S stateful diff runs in `foreachBatch` /
  * `transformWithState` (see Rsp.scala).
  *
  * R2S (`rsp/r2s.rs:14-59`):
  *  - RSTREAM = emit each firing's full relation
  *  - ISTREAM = rows of firing w absent from firing w-1
  *  - DSTREAM = rows of firing w-1 absent from firing w
  * The batch formulations below compute the diff with a self-anti-join on
  * consecutive window starts — used for oracle checks; the incremental
  * stateful versions live beside the streaming query builder.
  */
object StreamOps {

  /** Tumbling/sliding windowed relation: adds `wstart` (window start as
    * `yyyy-MM-dd HH:mm:ss`). Works on batch and streaming inputs. */
  def windowed(df: DataFrame, tsCol: String, width: String, slide: String): DataFrame =
    df.withColumn("__w", window(col(tsCol), width, slide))
      .withColumn("wstart", date_format(col("__w.start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("__w")

  def windowedAgg(df: DataFrame, tsCol: String, width: String, slide: String,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame =
    windowed(df, tsCol, width, slide)
      .groupBy(("wstart" +: groupCols).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Distinct per-window relation of `cols` — the input to R2S diffs. */
  def windowRelation(df: DataFrame, tsCol: String, width: String, slide: String,
      cols: Seq[String]): DataFrame =
    windowed(df, tsCol, width, slide).select(("wstart" +: cols).map(col): _*).distinct()

  /** Gap-based session windows via Spark's NATIVE `session_window`
    * operator (beyond-reference: the reference's S2R plane is time-driven
    * only). Sessions split when consecutive events per group are ≥ `gap`
    * apart; the window is [first_ts, last_ts + gap). Emits
    * `sstart`/`send` as epoch millis. Works identically on batch and
    * streaming inputs — streaming needs `withWatermark(tsCol, …)`
    * upstream and merges sessions across micro-batches in state (the
    * batch-vs-stream parity is pinned by StreamingSpec). One shuffle on
    * (group, session), same as any keyed aggregation. */
  def sessionWindowAgg(df: DataFrame, tsCol: String, gap: String,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("sstart", unix_millis(col("session_window.start")))
      .withColumn("send", unix_millis(col("session_window.end")))
      .drop("session_window")

  /** "2 hours" / "30 minutes" / "10 seconds" → seconds. */
  def durationSeconds(d: String): Long = {
    val Array(n, u) = d.trim.split("\\s+")
    n.toLong * (u.toLowerCase.stripSuffix("s") match {
      case "hour" => 3600L
      case "minute" => 60L
      case "second" => 1L
      case "day" => 86400L
      case other => throw new IllegalArgumentException(s"unit $other")
    })
  }

  /** Relabel each firing's rows to the NEXT firing's wstart — "the
    * previous firing's content, seen from firing t". */
  private def relabelToNextFiring(rel: DataFrame, slide: String): DataFrame = {
    val secs = durationSeconds(slide)
    rel.withColumn("wstart", date_format(
      to_timestamp(col("wstart")) + make_dt_interval(lit(0), lit(0), lit(0), lit(secs)),
      "yyyy-MM-dd HH:mm:ss"))
  }

  /** ISTREAM over a window-relation sequence: rows newly present vs the
    * previous firing (`r2s.rs:24-38`). */
  def istream(rel: DataFrame, slide: String): DataFrame = {
    val prev = relabelToNextFiring(rel, slide)
    rel.join(prev, rel.columns.toSeq, "left_anti")
  }

  /** DSTREAM: rows of the previous firing no longer present — reported at
    * the current firing's timestamp (`r2s.rs:40-52`). Only firings that
    * actually exist in the relation sequence report deletions. */
  def dstream(rel: DataFrame, slide: String): DataFrame = {
    val prevRelabeled = relabelToNextFiring(rel, slide)
    val firings = rel.select("wstart").distinct()
    prevRelabeled.join(rel, rel.columns.toSeq, "left_anti")
      .join(firings, Seq("wstart"), "left_semi")
  }

  def rstream(rel: DataFrame): DataFrame = rel
}
