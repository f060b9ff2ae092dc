package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ExpiredTimerInfo}
import graft.model.TermLex
import graft.sparql.Ast._

/** Distributed RSP data plane (SURVEY §3.3 "Spark shape"): the
  * full-semantics pipeline — CSPARQL window assignment, WINDOW-block BGP
  * join, fired-close selection, R2S — expressed as DataFrame/Dataset
  * transformations that shuffle on (close, join vars) instead of
  * collecting each micro-batch to the driver. This is the scale path for
  * the category [[RspEngine]] serves as the exact-sequencing control
  * plane: the same RSP-QL query text compiles onto either.
  *
  * Semantics parity with [[RspEngine]] (validated in DistributedRspSpec
  * against the engine's emission walkthroughs, themselves matched to
  * `kolibrie/tests/rsp_engine_test.rs:10-193`):
  *  - window content at close c = events with ts ∈ [c−RANGE, c]
  *    (`rsp/s2r.rs:298-330` scope), via an exact integer-arithmetic
  *    explode to covering closes — no range join;
  *  - fired closes = { maxClose(t) = ⌊(t−1)/STEP⌋·STEP : event at t } with
  *    c ≥ first event ts — exactly the TimeDriven max-closing-window
  *    advance (`s2r.rs:210-330`; [[RspEngine]]'s `advance`), including
  *    the sparse-stream skipping behavior;
  *  - ISTREAM/DSTREAM diff against the PREVIOUS FIRED close (the engine
  *    diffs consecutive firings, not consecutive step multiples), via a
  *    lag over the fired-close sequence — the one narrow global-window
  *    op, O(#closes) rows;
  *  - empty firings are not representable as relation rows (an RSTREAM
  *    emission with zero rows appears as no rows here).
  *
  * The streaming variants run the same stateless close-explode + BGP
  * join over a watermarked stream, gate on a fired-close stream
  * (stream-stream left-semi join), and compute R2S incrementally in
  * `transformWithState` keyed by the binding ([[IncrementalR2S]]) with
  * per-key state = last close seen — the CQL dense-tick formulation,
  * identical to [[StreamOps]]'s batch step-arithmetic on feeds where
  * every step fires.
  *
  * Scale posture: every join is an equi-join keyed by (close, vars) —
  * parallel across closes AND across key ranges within a close; the only
  * per-binding state is one (close, binding) pair in the state store.
  */
class DistributedRsp(spark: SparkSession, val query: RspQuery,
    /** Forward-chaining rules applied to each window's content before the
      * WINDOW-block query — the reference's `add_sparql_rules` R2R
      * enrichment (`rsp_engine.rs:105-212`), here as ONE fixpoint whose
      * every round is distributed across all closes (close rides every
      * premise join, so window isolation is free). Batch runs the full
      * fixpoint; the streaming path unrolls [[streamEnrichRounds]] rule
      * applications (a stream cannot loop — non-recursive rule sets need
      * exactly 1). */
    rules: Seq[Rule] = Nil,
    streamEnrichRounds: Int = 1) {
  import DistributedRsp._

  rules.foreach { r =>
    val terms = (r.premise ++ r.negativePremise ++ r.conclusion)
      .flatMap(tp => Seq(tp.s, tp.p, tp.o))
    require(!terms.exists {
      case q: Quoted => termVarsOf(q).nonEmpty
      case _ => false
    }, "distributed enrichment supports ground quoted terms only")
  }

  private lazy val condCompiler =
    new graft.sparql.Compiler(graft.model.QuadStore.empty(spark))

  /** WINDOW-block patterns per window IRI. The distributed plane compiles
    * pure-BGP blocks; richer blocks (FILTER, UNION, subselects) stay on
    * the driver engine. */
  private val windowBlocks: Map[String, Seq[TriplePattern]] =
    query.select.where.collect { case WindowBlockElem(w, elems) =>
      w -> elems.flatMap {
        case Bgp(ps) => ps
        case other => throw new IllegalArgumentException(
          s"distributed RSP plane supports pure-BGP WINDOW blocks; found $other " +
            "— use RspEngine for full block semantics")
      }
    }.toMap

  query.windows.foreach { w =>
    require(windowBlocks.contains(w.iri), s"no WINDOW block for ${w.iri}")
  }

  // 'close' / 'closeTs' are the plane's reserved join-key columns; a query
  // variable with either name would collide with them in every scan
  require(!windowBlocks.values.flatten
      .flatMap(tp => Seq(tp.s, tp.p, tp.o)).collect { case Var(n) => n }
      .exists(n => n == "close" || n == "closeTs"),
    "?close and ?closeTs are reserved column names on the distributed RSP plane")

  // fail loudly on surface the plane does not compile, instead of
  // silently returning different results than RspEngine would
  require(query.select.where.forall(_.isInstanceOf[WindowBlockElem]),
    "distributed RSP plane compiles WINDOW blocks only; static patterns / " +
      "FILTERs outside windows need the driver engine (RspEngine)")
  require(query.select.projection == Seq("*") && query.select.aggregates.isEmpty &&
      query.select.groupBy.isEmpty && query.select.orderBy.isEmpty &&
      query.select.limit.isEmpty && query.select.offset.isEmpty &&
      !query.select.distinct,
    "distributed RSP plane supports SELECT * without modifiers; " +
      "projections/aggregates/modifiers need the driver engine (RspEngine)")
  // multi-window coordination here is the aligned-close join (Wait
  // semantics); Steal/Timeout cycles are the driver engine's coordinator
  require(query.windows.size == 1 ||
      query.policy.forall(_ == WaitPolicy),
    "distributed RSP plane coordinates multi-window queries with aligned-close " +
      "Wait semantics; WITH POLICY steal/timeout needs the driver engine (RspEngine)")

  private def step(w: WindowSpec): Long = math.max(w.stepMs, 1L)

  /** Events routed to window spec `w` by stream IRI (suffix-normalized,
    * `rsp_engine.rs:773-810`; same rule as [[RspEngine]]). Input columns:
    * `(stream, ts: long ms, s, p, o)`. */
  private def routed(events: DataFrame, w: WindowSpec): DataFrame = {
    if (w.streamIri == "*" || w.streamIri.startsWith("?")) return events
    def normCol(c: Column): Column =
      substring_index(substring_index(c, "/", -1), ":", -1)
    val spec = w.streamIri
    val specNorm = spec.substring(math.max(spec.lastIndexOf('/'), spec.lastIndexOf(':')) + 1)
    events.filter(col("stream") === spec || normCol(col("stream")) === specNorm)
  }

  /** Fired closes of window `w` over a batch of events: the distinct
    * max-closing closes of each arrival, at or after the first event. */
  def firedCloses(events: DataFrame, w: WindowSpec): DataFrame = {
    val st = step(w)
    val e = routed(events, w)
    val minTs = e.agg(min(col("ts")).as("__minTs"))
    e.select(maxClose(col("ts"), st).as("close")).distinct()
      .crossJoin(broadcast(minTs))
      .filter(col("close") >= col("__minTs"))
      .select("close")
  }

  /** `(close, s, p, o)` window content: each event exploded to the closes
    * whose window covers it (ts ≤ c ≤ ts+RANGE, c ≡ 0 mod STEP), kept
    * only for fired closes. Extra columns of `events` are preserved. */
  def windowContent(events: DataFrame, w: WindowSpec): DataFrame =
    windowContent(events, w, firedCloses(events, w))

  private def windowContent(events: DataFrame, w: WindowSpec,
      fired: DataFrame): DataFrame = {
    val exploded = explodeCloses(routed(events, w), w.rangeMs, step(w))
    exploded.join(fired, Seq("close"), "left_semi")
  }

  /** One pattern scan over `(close, s, p, o)` content: constants filter,
    * variables project; `close` always rides along as a join key (plus
    * `closeTs`, the streaming path's watermarked event-time twin of
    * close, when present — keeping it in every join key set is what
    * bounds stream-stream join state). */
  private def scan(content: DataFrame, tp: TriplePattern): DataFrame = {
    var filters = List.empty[Column]
    var binds = List.empty[(String, Column)]
    def walk(c: Column, t: Term): Unit = t match {
      case Var(n) => binds ::= (n -> c)
      case other => filters ::= (c === lit(TermLex.lexical(other)))
    }
    walk(col("s"), tp.s); walk(col("p"), tp.p); walk(col("o"), tp.o)
    val grouped = binds.reverse.groupBy(_._1)
    val eqs = grouped.values.flatMap(cs => cs.tail.map(x => x._2 === cs.head._2))
    val filtered = (filters ++ eqs).foldLeft(content)((d, f) => d.filter(f))
    val keys = Seq(col("close")) ++
      (if (content.columns.contains("closeTs")) Seq(col("closeTs")) else Nil)
    filtered.select(grouped.map { case (n, cs) => cs.head._2.as(n) }.toSeq ++
      keys: _*)
  }

  /** One rule application over close-keyed content `(close[, closeTs],
    * s, p, o)`: premise scans joined on shared vars + close, close-scoped
    * NAF anti-joins, filters, head instantiation with the close keys
    * preserved. */
  private def applyRuleOnce(facts: DataFrame, rule: Rule): DataFrame = {
    val keys = Seq("close") ++
      (if (facts.columns.contains("closeTs")) Seq("closeTs") else Nil)
    var b = rule.premise.map(scan(facts, _)).reduce(joinOnShared)
    rule.negativePremise.foreach { ntp =>
      val neg = scan(facts, ntp)
      val shared = b.columns.filter(neg.columns.contains(_)).toSeq
      b = b.join(neg, shared, "left_anti")
    }
    rule.filters.foreach(f => b = b.filter(condCompiler.compileCond(b, f)))
    def termCol(t: Term): Column = t match {
      case Var(n) =>
        if (b.columns.contains(n)) col(n)
        else lit(null).cast(org.apache.spark.sql.types.StringType)
      case other => lit(TermLex.lexical(other))
    }
    rule.conclusion.map { tp =>
      b.select(keys.map(col) ++ Seq(termCol(tp.s).as("s"),
        termCol(tp.p).as("p"), termCol(tp.o).as("o")): _*)
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
    }.reduce(_ unionByName _)
  }

  /** Batch R2R enrichment: naive fixpoint, each round one distributed
    * rule pass across ALL closes at once. */
  private def enrichFixpoint(content: DataFrame): DataFrame = {
    val keys = Seq("close") ++
      (if (content.columns.contains("closeTs")) Seq("closeTs") else Nil)
    var facts = content.select((keys ++ Seq("s", "p", "o")).map(col): _*)
      .distinct().localCheckpoint()
    var round = 0
    while (round < 32) {
      val derived = rules.map(applyRuleOnce(facts, _)).reduce(_ unionByName _)
      val delta = derived.join(facts, facts.columns.toSeq, "left_anti")
        .distinct().localCheckpoint()
      if (delta.isEmpty) return facts
      facts = facts.unionByName(delta).localCheckpoint()
      round += 1
    }
    throw new IllegalStateException(
      "R2R enrichment did not reach its fixpoint within 32 rounds")
  }

  /** The compiled WINDOW-block relation of `w`: pattern scans equi-joined
    * on shared variables + close, distinct (the R2R store has set
    * semantics). Registered rules enrich the content first. */
  def windowRelation(events: DataFrame, w: WindowSpec): DataFrame =
    windowRelation(events, w, firedCloses(events, w))

  private def windowRelation(events: DataFrame, w: WindowSpec,
      fired: DataFrame): DataFrame = {
    val content0 = windowContent(events, w, fired)
    val content = if (rules.isEmpty) content0 else enrichFixpoint(content0)
    windowBlocks(w.iri).map(scan(content, _)).reduce(joinOnShared).distinct()
  }

  /** All windows' relations joined on (close, shared vars) — aligned-close
    * Wait semantics. Multi-window queries with unaligned specs need the
    * driver engine's coordinator. */
  def relation(events: DataFrame): DataFrame =
    query.windows.map(windowRelation(events, _)).reduce(joinOnShared)

  /** Fired-close sequence with its predecessor (lag over the ordered close
    * set — one narrow single-partition window over O(#closes) rows; at
    * scale #closes = timespan/step, not data volume). */
  private def closeSeq(fired: DataFrame): DataFrame =
    fired.withColumn("__prev", lag("close", 1).over(Window.orderBy("close")))

  /** R2S over the relation sequence, diffing consecutive FIRED closes:
    * emission rows `(close, vars…)`. The diff references the relation on
    * both join sides and the fired set three times (content gating, rel,
    * lag sequence), so I/DSTREAM checkpoint both once instead of paying
    * the subplans repeatedly. */
  def emissions(events: DataFrame): DataFrame = {
    query.kind match {
      case RStream => relation(events)
      case IStream =>
        // rows at close c absent from the relation at the previous fired
        // close (first firing: prev = null → nothing relabels → emit all)
        val (rel, fired) = checkpointedRelAndFired(events)
        val prevRows = relabelPrevToCurrent(rel, closeSeq(fired))
        rel.join(prevRows, rel.columns.toSeq, "left_anti")
      case DStream =>
        // rows of the previous fired close absent at c, reported at c
        val (rel, fired) = checkpointedRelAndFired(events)
        val prevRows = relabelPrevToCurrent(rel, closeSeq(fired))
        prevRows.join(rel, rel.columns.toSeq, "left_anti")
    }
  }

  private def checkpointedRelAndFired(events: DataFrame): (DataFrame, DataFrame) = {
    require(query.windows.size == 1,
      "I/DSTREAM diff sequencing is single-window; multi-window uses RspEngine")
    val w = query.windows.head
    val fired = firedCloses(events, w).localCheckpoint()
    (windowRelation(events, w, fired).localCheckpoint(), fired)
  }

  private def relabelPrevToCurrent(rel: DataFrame, seq: DataFrame): DataFrame = {
    val vars = rel.columns.filter(_ != "close").toSeq
    rel.join(seq.select(col("__prev"), col("close").as("__cur")),
        col("close") === col("__prev"))
      .select(vars.map(col) :+ col("__cur").as("close"): _*)
  }

  // ---- streaming variants --------------------------------------------------

  /** Streaming `(close, vars…)` relation over a stream with columns
    * `(stream, ts: timestamp, s, p, o)`: stateless close explode + BGP
    * stream-stream equi-joins + fired-close gating (left-semi against the
    * max-close stream). Defines the query's watermark internally (on
    * `closeTs`) — callers must NOT watermark the input (Spark forbids
    * redefinition along one lineage). */
  def streamRelation(events: DataFrame): DataFrame = {
    require(query.windows.size == 1,
      "streaming plane is single-window; multi-window uses RspEngine")
    val w = query.windows.head
    val st = step(w)
    // `closeTs` is close re-expressed as a timestamp and watermarked on
    // BOTH sides — putting it in every stream-stream join key satisfies
    // Spark's watermark-in-join-keys requirement and bounds join state.
    // Delay = RANGE+STEP covers the skew between an arrival's ts and the
    // earliest close it can participate in on either side.
    val delay = s"${w.rangeMs + st} milliseconds"
    val e = routed(events, w).withColumn("__tsms",
      (unix_micros(col("ts")) / lit(1000L)).cast("long"))
    val content = explodeCloses(e.drop("ts").withColumnRenamed("__tsms", "ts"),
        w.rangeMs, st)
      .withColumn("closeTs", timestamp_millis(col("close")))
      .withWatermark("closeTs", delay)
    val fired = routed(events, w)
      .select(maxClose((unix_micros(col("ts")) / lit(1000L)).cast("long"), st).as("close"))
      .withColumn("closeTs", timestamp_millis(col("close")))
      .withWatermark("closeTs", delay)
    val gated = content.join(fired, Seq("close", "closeTs"), "left_semi")
    // streaming enrichment: a stream cannot loop a fixpoint, so unroll a
    // fixed number of rule passes (non-recursive rule sets need exactly 1);
    // duplicates are merged by the downstream R2S per-key distinct.
    // A RECURSIVE rule set under the default single unroll would silently
    // under-derive — warn loudly (the batch path runs the full fixpoint).
    if (rules.nonEmpty && streamEnrichRounds == 1) {
      def constPred(t: Term): Option[String] = t match {
        case Iri(x) => Some(x); case Lit(x) => Some(x); case _ => None
      }
      val heads = rules.flatMap(_.conclusion).map(tp => constPred(tp.p))
      val premises = rules.flatMap(r => r.premise ++ r.negativePremise)
        .map(tp => constPred(tp.p))
      if (heads.exists(h => h.isEmpty || premises.exists(p => p.isEmpty || p == h)))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "recursive rule set on the streaming plane with streamEnrichRounds=1: " +
            "derivations deeper than one rule application are NOT produced. " +
            "Raise streamEnrichRounds to the closure depth, or use the batch " +
            "path / RspEngine.")
    }
    val enriched =
      if (rules.isEmpty) gated
      else (0 until streamEnrichRounds).foldLeft(
          gated.select(col("close"), col("closeTs"), col("s"), col("p"), col("o"))) {
        (facts, _) =>
          facts.unionByName(rules.map(applyRuleOnce(facts, _)).reduce(_ unionByName _))
      }
    windowBlocks(w.iri).map(scan(enriched, _)).reduce(joinOnShared)
  }

  /** Streaming emissions: RSTREAM passes the relation through (deduped
    * within the watermark — the batch relation has set semantics, and a
    * duplicated arrival or a rule re-deriving an existing fact would
    * otherwise emit twice); ISTREAM / DSTREAM run incrementally in
    * transformWithState keyed by binding ([[IncrementalR2S]], state =
    * last close per binding — their per-key close dedup subsumes the
    * distinct). */
  def streamEmissions(events: DataFrame): Dataset[R2SRow] = {
    val relAll = streamRelation(events)
    val deduped = query.kind match {
      case RStream => relAll.dropDuplicatesWithinWatermark()
      case _ => relAll
    }
    val rel = deduped.drop("closeTs")
    val vars = rel.columns.filter(_ != "close").toSeq
    val rows = toR2SRows(rel, vars)
    val st = step(query.windows.head)
    query.kind match {
      case RStream => rows
      case IStream => IncrementalR2S.istream(rows, st)
      case DStream => IncrementalR2S.dstream(rows, st)
    }
  }
}

object DistributedRsp {
  /** `(close, binding)` — the rows flowing through incremental R2S. */
  final case class R2SRow(close: Long, binding: Map[String, String])

  private[streaming] def termVarsOf(t: Term): Seq[String] = t match {
    case Var(n) => Seq(n)
    case Quoted(s, p, o) => termVarsOf(s) ++ termVarsOf(p) ++ termVarsOf(o)
    case _ => Nil
  }

  /** max-closing window of an arrival at `ts`: largest STEP multiple < ts.
    * [[maxCloseLong]] is the scalar twin [[RspEngine]] advances with —
    * the batch/control-plane parity suite rests on the two staying
    * identical, so both live here. */
  private[streaming] def maxClose(ts: Column, step: Long): Column =
    (ts - 1) - ((ts - 1) % step)

  private[streaming] def maxCloseLong(ts: Long, step: Long): Long =
    (ts - 1) - ((ts - 1) % step)

  /** Explode each event to its covering closes: ts ≤ c ≤ ts+range,
    * c ≡ 0 (mod step). Exact long arithmetic (no double division — at ms
    * epoch scale doubles lose the boundary). */
  private[streaming] def explodeCloses(e: DataFrame, range: Long, step: Long): DataFrame = {
    val cLo = col("ts") + ((lit(step) - (col("ts") % step)) % step)
    val cHi = (col("ts") + range) - ((col("ts") + range) % step)
    e.withColumn("close",
        explode(when(cLo <= cHi, sequence(cLo, cHi, lit(step)))
          .otherwise(array().cast("array<bigint>"))))
  }

  private[streaming] def joinOnShared(l: DataFrame, r: DataFrame): DataFrame = {
    val shared = l.columns.filter(r.columns.contains).toSeq // always has close
    l.join(r, shared, "inner")
  }

  private[streaming] def toR2SRows(rel: DataFrame, vars: Seq[String]): Dataset[R2SRow] = {
    import rel.sparkSession.implicits._
    rel.select(col("close") +:
        vars.map(v => col(v).cast("string").as(v)): _*)
      .map { row =>
        R2SRow(row.getLong(0),
          vars.zipWithIndex.flatMap { case (v, i) =>
            Option(row.getString(i + 1)).map(v -> _)
          }.toMap)
      }
  }
}

/** Incremental R2S operators over a `(close, binding)` stream —
  * `transformWithState` keyed by the binding, state = the last close at
  * which the binding appeared (`r2s.rs:24-52` semantics in the CQL
  * dense-tick formulation; identical to [[StreamOps]]'s batch
  * step-arithmetic diffs, which StreamingSpec asserts).
  *
  * Delivery contract: per key, closes must arrive non-decreasing across
  * micro-batches (rows with close ≤ the key's last seen close are treated
  * as duplicates and dropped). An out-of-order delivery that a wide
  * lateness allowance admits — a late event joining an old retained close
  * AFTER a newer close for the same binding was processed — would be
  * mis-diffed; feeds replayed in event-time order (every spec here) and
  * watermark-ordered pipelines satisfy the contract, and the batch
  * formulations remain the reorder-tolerant route. A watermark-buffered
  * variant (ListState + timers, emit in close order once the watermark
  * passes) is the known upgrade if reordered feeds become a requirement:
  *
  *  - ISTREAM: emit (c, b) iff b was absent at c − step;
  *  - DSTREAM: emit (c', b) at the first close c' = lastSeen + step where
  *    b is absent — detected eagerly when b reappears after a gap, and by
  *    an event-time timer when b never reappears.
  *
  * State per binding is one long (+ the binding for timer emission) —
  * the minimal footprint for exact diffs over unbounded streams.
  */
object IncrementalR2S {
  import DistributedRsp.R2SRow

  private class IstreamProcessor(step: Long)
      extends StatefulProcessor[String, R2SRow, R2SRow] {
    @transient private var last: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("lastClose", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[R2SRow],
        tv: TimerValues): Iterator[R2SRow] = {
      val sorted = rows.toSeq.distinctBy(_.close).sortBy(_.close)
      val out = Seq.newBuilder[R2SRow]
      sorted.foreach { r =>
        if (!last.exists()) { out += r; last.update(r.close) }
        else if (r.close > last.get()) { // ≤ last: duplicate/late, done
          if (last.get() != r.close - step) out += r
          last.update(r.close)
        }
      }
      out.result().iterator
    }
  }

  private class DstreamProcessor(step: Long)
      extends StatefulProcessor[String, R2SRow, R2SRow] {
    @transient private var last: org.apache.spark.sql.streaming.ValueState[(Long, Map[String, String])] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[(Long, Map[String, String])]("lastSeen",
        Encoders.product[(Long, Map[String, String])], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[R2SRow],
        tv: TimerValues): Iterator[R2SRow] = {
      val sorted = rows.toSeq.distinctBy(_.close).sortBy(_.close)
      val out = Seq.newBuilder[R2SRow]
      sorted.foreach { r =>
        if (!last.exists() || r.close > last.get()._1) { // ≤ last: dup/late
          if (last.exists() && last.get()._1 + step < r.close)
            out += R2SRow(last.get()._1 + step, last.get()._2) // gap deletion
          last.update((r.close, r.binding))
          // fire a full step past the deletion close: when the watermark
          // sits exactly ON close c, rows for c may still arrive in the
          // next batch — a timer at c would race them and emit a spurious
          // deletion for a binding that is in fact present at c
          getHandle.registerTimer(r.close + 2 * step)
        }
      }
      out.result().iterator
    }
    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[R2SRow] = {
      if (last.exists() && info.getExpiryTimeInMs == last.get()._1 + 2 * step) {
        val (c, b) = last.get()
        last.clear()
        Iterator.single(R2SRow(c + step, b))
      } else Iterator.empty
    }
  }

  private def keyed(rows: Dataset[R2SRow]) = {
    import rows.sparkSession.implicits._
    // length-prefixed encoding: separator bytes can appear INSIDE values
    // (RDF-star lexical forms embed \u0001 via TermLex.QtSep), so plain
    // separator joining would let two distinct bindings collide onto one
    // transformWithState key and share lastClose state
    rows.groupByKey(r => r.binding.toSeq.sorted
      .map { case (k, v) => s"${k.length}:$k${v.length}:$v" }.mkString)
  }

  /** Incremental ISTREAM (requires RocksDB state store provider). */
  def istream(rows: Dataset[R2SRow], step: Long): Dataset[R2SRow] = {
    import rows.sparkSession.implicits._
    keyed(rows).transformWithState(new IstreamProcessor(step),
      TimeMode.EventTime(), OutputMode.Append())
  }

  /** Incremental DSTREAM with event-time timers for final disappearance. */
  def dstream(rows: Dataset[R2SRow], step: Long): Dataset[R2SRow] = {
    import rows.sparkSession.implicits._
    keyed(rows).transformWithState(new DstreamProcessor(step),
      TimeMode.EventTime(), OutputMode.Append())
  }
}
