package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators a large-scale analytics pipeline needs beside
  * the windowed RSP plane: point-in-time (as-of) joins and gap-based
  * sessionization. Beyond-reference surface (the reference's closest
  * shape is the RSP plane's per-close latest-fired as-of map,
  * `kolibrie/src/rsp_engine.rs` window close sequencing — these are the
  * batch/relational generalizations).
  *
  * Scale notes: both operators are ONE hash shuffle on the join/session
  * key followed by narrow window arithmetic — no range-join explosion,
  * no per-key driver loop. The as-of join is the union-tag formulation
  * (tag both sides, sort-merge once, carry the latest right payload
  * forward with `last(ignoreNulls)`), the standard way to make
  * point-in-time joins linear instead of the O(left × right-per-key)
  * naive inequality join: at 100 TB the inequality join materializes
  * every (left row × earlier right row) pair before ranking, while this
  * shape never materializes more than the unioned input.
  */
object EventOps {

  /** Backward (inclusive) as-of join: each left row picks the single
    * right row with the same `keys` and the greatest `rightTs` ≤ its
    * `leftTs`, carrying `payload` columns prefixed with `matched_`
    * (null when no prior right row exists — left-join semantics).
    *
    * Ties are deterministic: among right rows sharing (keys, ts), the
    * one greatest by `payload` column order wins (the window sorts by
    * them, and `last` takes the final row of the frame). The payload is
    * carried as ONE struct so all matched columns come from the SAME
    * right row even when some payload fields are null.
    *
    * `toleranceMs`: with Some(t), a match older than `t` milliseconds
    * (by the `tsMs` epoch-ms columns) is nulled out — pandas
    * `merge_asof(tolerance=...)` semantics: the left row survives with
    * null matched columns.
    */
  def asOfJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsMs: String, rightTsMs: String, payload: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoinBackward: at least one key column")
    require(payload.nonEmpty, "asOfJoinBackward: at least one payload column")
    val leftCols = left.columns.toSeq
    val matchedTs = "matched_" + rightTsMs
    // union-tag: right rows (src=0) sort BEFORE left rows (src=1) at an
    // equal timestamp, so the backward match is ts-inclusive
    val rightTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTsMs).cast("long").as("__ts"), lit(0).as("__src"),
        struct(col(rightTsMs).cast("long").as(matchedTs) +:
          payload.map(c => col(c).as("matched_" + c)): _*).as("__pay")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTsMs).cast("long").as("__ts"), lit(1).as("__src"),
        lit(null).cast(rightTagged.schema("__pay").dataType).as("__pay")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    // deterministic physical order inside ts ties: payload columns break
    // right-right ties (last() then picks the payload-greatest row)
    val order: Seq[Column] = col("__ts").asc +: col("__src").asc +:
      payload.map(c => col("__pay")("matched_" + c).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = rightTagged.unionByName(leftTagged)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    val tolerated = toleranceMs match {
      case Some(t) => joined.withColumn("__m",
        when(col("__ts") - col("__m")(matchedTs) <= t, col("__m")))
      case None => joined
    }
    tolerated.select(
      leftCols.map(col) ++
        (matchedTs +: payload.map("matched_" + _)).map(c => col("__m")(c).as(c)): _*)
  }

  /** Per-event session assignment: a new session starts when the gap to
    * the previous event of the same `keyCol` exceeds `gapMs`. Adds
    * `session_no` (1-based per key, in time order). `tiebreak` makes the
    * event order total when timestamps collide. One shuffle on the key;
    * the lag and the running sum share the same window exchange. */
  def sessionize(events: DataFrame, keyCol: String, tsMsCol: String,
      gapMs: Long, tiebreak: Seq[String] = Seq.empty): DataFrame = {
    require(gapMs > 0, "sessionize: gapMs must be positive")
    // order by the SAME cast the gap arithmetic uses — a string-typed ms
    // column would otherwise sort lexicographically under a numeric gap
    val order = col(tsMsCol).cast("long").asc +: tiebreak.map(col(_).asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val prev = lag(col(tsMsCol).cast("long"), 1).over(w)
    events
      .withColumn("__brk",
        when(prev.isNull || col(tsMsCol).cast("long") - prev > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** Per-session aggregates: (key, session_no, session_start, session_end,
    * n_events, sum of `valueCol` rounded to 6). The groupBy keys start
    * with the session key, so the window stage's hash partitioning
    * already satisfies the aggregation's distribution — no second
    * shuffle. */
  def sessions(events: DataFrame, keyCol: String, tsMsCol: String,
      gapMs: Long, valueCol: String, tiebreak: Seq[String] = Seq.empty): DataFrame =
    sessionize(events, keyCol, tsMsCol, gapMs, tiebreak)
      .groupBy(col(keyCol), col("session_no"))
      .agg(
        min(col(tsMsCol).cast("long")).as("session_start"),
        max(col(tsMsCol).cast("long")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 6).as("sum_value"))

  /** Trailing time-window aggregates per key: for every event, the count
    * and value-sum of the SAME key's events in `[ts − windowMs, ts]`
    * (inclusive — a RANGE frame, so simultaneous events always aggregate
    * together regardless of physical order). Sums run in integer
    * micro-units (value pre-rounded to 6 decimals) so the window total is
    * independent of accumulation order — the same engine-portability
    * trick as BM25 scoring. One hash shuffle on the key; the frame
    * arithmetic is narrow within each partition. */
  def rollingAgg(events: DataFrame, keyCol: String, tsMsCol: String,
      valueCol: String, windowMs: Long): DataFrame = {
    require(windowMs > 0, "rollingAgg: windowMs must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(tsMsCol).cast("long"))
      .rangeBetween(-windowMs, 0)
    events
      .withColumn("__vmicro",
        round(col(valueCol) * lit(1000000.0)).cast("long"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_micro", sum(col("__vmicro")).over(w))
      .drop("__vmicro")
  }

  /** LIVE interval join — the same pairing contract as [[intervalJoin]]
    * on an unbounded stream, via Spark's native stream-stream inner join
    * with an event-time range condition. The range condition plus the
    * two watermarks are what make the join's state BOUNDED: each side
    * keeps only rows inside the other's reachable window (Spark evicts
    * beyond `watermark` + the range span), so state is
    * O(rate × (horizon + span)), not the stream. Timestamp columns are
    * event-time `TimestampType`; right payload arrives `matched_`-
    * prefixed, the matched right timestamp as `matched_<rightTsCol>`. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, loMs: Long, hiMs: Long,
      watermark: String, rightPayload: Seq[String]): DataFrame = {
    require(hiMs >= loMs, s"intervalJoinStream: hiMs $hiMs must be >= loMs $loMs")
    require(keys.nonEmpty, "intervalJoinStream: at least one key column")
    val matchedTs = "matched_" + rightTsCol
    val lw = left.withWatermark(leftTsCol, watermark)
    val rw = right.select(
        (keys.map(c => col(c).as("__r_" + c)) :+ col(rightTsCol).as(matchedTs)) ++
          rightPayload.map(c => col(c).as("matched_" + c)): _*)
      .withWatermark(matchedTs, watermark)
    // literal DayTimeInterval bounds — the analyzer recognizes them as a
    // watermark range constraint and derives the state-eviction horizon
    val cond = keys.map(c => col(c) === col("__r_" + c)).reduce(_ && _) &&
      col(matchedTs) >= col(leftTsCol) + lit(java.time.Duration.ofMillis(loMs)) &&
      col(matchedTs) <= col(leftTsCol) + lit(java.time.Duration.ofMillis(hiMs))
    lw.join(rw, cond, "inner").drop(keys.map("__r_" + _): _*)
  }

  /** Interval (range) join: every (left, right) pair sharing `keys` with
    * `rightTs ∈ [leftTs + loMs, leftTs + hiMs]` (inclusive, epoch-ms
    * arithmetic). Inner-join semantics, one output row per pair; right
    * payload columns arrive prefixed `matched_`.
    *
    * Scale shape — TIME-BUCKET BLOCKING, the standard fix for Spark
    * planning a raw time-inequality join as a per-key nested loop (every
    * left row × every right row of the key before filtering): with
    * bucket width W = hi − lo + 1, a left row's window spans AT MOST two
    * buckets, so the left side explodes into ≤2 probe rows and the join
    * becomes a pure equi-join on (keys, bucket) with the exact range
    * test as a cheap post-filter. Join fanout is true matches plus
    * same-bucket near-misses — never the per-key cross product. Hot
    * (key, bucket) cells are data skew the same way any equi-join key
    * is, so AQE skew-join handles them. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsMs: String, rightTsMs: String, loMs: Long, hiMs: Long,
      rightPayload: Seq[String]): DataFrame = {
    require(hiMs >= loMs, s"intervalJoin: hiMs $hiMs must be >= loMs $loMs")
    require(keys.nonEmpty, "intervalJoin: at least one key column")
    val width = hiMs - loMs + 1
    val matchedTs = "matched_" + rightTsMs
    val r = right.select(
        (keys.map(col) :+ col(rightTsMs).cast("long").as("__rts")) ++
          rightPayload.map(c => col(c).as("matched_" + c)): _*)
      .withColumn("__bucket", floor(col("__rts") / width))
    val l = left.withColumn("__lts", col(leftTsMs).cast("long"))
      .withColumn("__bucket", explode(array_distinct(array(
        floor((col("__lts") + loMs) / width),
        floor((col("__lts") + hiMs) / width)))))
    l.join(r, keys :+ "__bucket")
      .filter(col("__rts") >= col("__lts") + loMs &&
        col("__rts") <= col("__lts") + hiMs)
      .withColumn(matchedTs, col("__rts"))
      .drop("__bucket", "__lts", "__rts")
  }

  /** First-touch funnel over an ordered stage list: per key, `t_<stage0>`
    * is the key's earliest stage-0 event, and each later `t_<stageI>` is
    * its earliest stage-i event STRICTLY after `t_<stageI-1>` (the
    * classic product-analytics conversion funnel — simultaneous events
    * don't advance a stage). Keys that never reach stage 0 are dropped;
    * later stages are null once the chain breaks. `stages_reached`
    * counts the non-null prefix.
    *
    * Scale shape: ONE hash shuffle on the key. Each stage time is an
    * unordered (whole-partition frame) conditional window min — the
    * stacked Window operators all share the same partitioning, and the
    * final per-key collapse is a groupBy on that same key, so Catalyst
    * plans a single Exchange for the whole chain; no sort-heavy ordered
    * frames, no per-stage join cascade. */
  def funnel(events: DataFrame, keyCol: String, tsMsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: at least one stage")
    require(stages.distinct.size == stages.size, "funnel: stages must be distinct")
    val w = Window.partitionBy(keyCol)
    val ts = col(tsMsCol).cast("long")
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val cond = if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && ts > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(cond, ts)).over(w))
    }
    val tCols = stages.indices.map(i => min(col(s"__t$i")).as(s"t_${stages(i)}"))
    // fold ascending so the LAST stage's check lands outermost — the
    // nulls chain, so the first non-null test from the top wins
    val reached = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t_${stages(i)}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    staged.groupBy(col(keyCol))
      .agg(tCols.head, tCols.tail: _*)
      .filter(col(s"t_${stages.head}").isNotNull)
      .withColumn("stages_reached", reached)
  }
}
