package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{DistributedRsp, StreamOps}

/** Streaming-layer correctness queries (SURVEY §2.9) in their batch
  * formulation: Spark's `window()` assigns events to time windows with
  * exactly the CSPARQL `scope()` semantics, and the R2S operators are
  * relation-sequence diffs — both verifiable against DuckDB on the
  * `events` table. The live Structured Streaming path (watermarks,
  * MemoryStream, incremental R2S emission) is asserted in StreamingSpec —
  * same operators, same code path for window assignment.
  */
object StreamSuite {

  /** Schema-adaptive events read — see [[graft.streaming.EventsReader]]
    * (the r5 testdata drift to `timestamp[us]` broke six hand-rolled
    * copies of this; there is now exactly one). */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsReader.events(s, dir)

  private lazy val httpClient = java.net.http.HttpClient.newHttpClient()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_agg" -> ((s, dir) =>
      StreamOps.windowedAgg(events(s, dir), "ts", "1 hour", "1 hour",
        Seq("event_type"),
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv")))),

    "stream_sliding_agg" -> ((s, dir) =>
      StreamOps.windowedAgg(events(s, dir), "ts", "2 hours", "30 minutes",
        Seq("event_type"),
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv")))),

    "stream_istream" -> ((s, dir) =>
      StreamOps.istream(
        StreamOps.windowRelation(events(s, dir), "ts", "1 hour", "1 hour",
          Seq("event_type")), "1 hour")),

    "stream_dstream" -> ((s, dir) =>
      StreamOps.dstream(
        StreamOps.windowRelation(events(s, dir), "ts", "1 hour", "1 hour",
          Seq("event_type")), "1 hour")),

    // gap-based session windows via Spark's NATIVE session_window operator
    // (batch leg; the streaming merge-across-microbatches leg is pinned in
    // StreamingSpec). Timestamps are ms-truncated so the split decision is
    // bit-identical to the DuckDB mirror's epoch-ms arithmetic.
    "stream_session_agg" -> ((s, dir) => {
      val e = graft.streaming.EventsReader.eventsMs(s, dir)
        .withColumn("tsms", timestamp_millis(col("tms")))
      StreamOps.sessionWindowAgg(e, "tsms", "12 hours", Seq("user_id"),
        Seq(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv")))
    }),

    // Distributed RSP data plane end-to-end: events triplized, RSP-QL
    // parsed, WINDOW-block BGP (star join on ?e + constant filter)
    // compiled to (close, vars) equi-joins over exploded CSPARQL windows —
    // RSTREAM relation per fired close, then the ISTREAM consecutive-
    // fired-close diff. No driver collect anywhere in the plan.
    "stream_window_bgp" -> ((s, dir) =>
      new DistributedRsp(s, windowBgpQuery).emissions(eventTriples(s, dir))
        .select("close", "e", "u")),

    "stream_window_istream" -> ((s, dir) =>
      new DistributedRsp(s, windowBgpQuery.copy(kind = graft.sparql.Ast.IStream))
        .emissions(eventTriples(s, dir))
        .select("close", "e", "u")),

    // FILTER inside the WINDOW block, compiled on the distributed plane
    // (numeric-if-both-parse comparison over the triplized value)
    "stream_window_filter" -> ((s, dir) =>
      new DistributedRsp(s, windowFilterQuery)
        .emissions(eventTriplesWithValue(s, dir))
        .select("close", "e", "u", "v")),

    // property path inside the WINDOW block (r6; was engine-only):
    // ^<ev/type>/<ev/user> walks type-value → event → user per close
    "stream_window_path" -> ((s, dir) =>
      new DistributedRsp(s, windowPathQuery)
        .emissions(eventTriples(s, dir))
        .select("close", "t", "u")),

    // BIND + VALUES inside the WINDOW block (r6; were engine-only):
    // BIND extends per row, VALUES constrains via a broadcast inline
    // relation
    "stream_window_bind_values" -> ((s, dir) =>
      new DistributedRsp(s, windowBindValuesQuery)
        .emissions(eventTriples(s, dir))
        .select("close", "e", "t", "tag")),

    // per-close aggregate: COUNT grouped by (close, ?u) as ONE distributed
    // aggregation across all closes — the CityBench-style per-window agg
    "stream_window_agg" -> ((s, dir) =>
      new DistributedRsp(s, windowAggQuery)
        .emissions(eventTriples(s, dir))
        .select("close", "u", "n")),

    // same-variable UNION inside the WINDOW block (alternative event
    // types), compiled as a per-close union of branch relations
    "stream_window_union" -> ((s, dir) =>
      new DistributedRsp(s, windowUnionQuery)
        .emissions(eventTriples(s, dir))
        .select("close", "e", "u")),

    // trailing OPTIONAL inside the WINDOW block: per-close compat
    // left_outer join — high-value purchases carry an ev/flag triple,
    // the rest emit with ?f unbound (null)
    "stream_window_optional" -> ((s, dir) =>
      new DistributedRsp(s, windowOptionalQuery)
        .emissions(eventTriplesWithFlag(s, dir))
        .select("close", "e", "u", "f")),

    // HAVING on the main RSP SELECT (r6): per-close aggregate constraint
    // via the batch compiler's synthetic-aggregate rewrite — repeat
    // purchasers (≥ 2 in the window) only
    "stream_window_agg_having" -> ((s, dir) =>
      new DistributedRsp(s, windowAggHavingQuery)
        .emissions(eventTriples(s, dir))
        .select("close", "u", "n")),

    // per-window top-k via a subselect in the WINDOW block (CityBench's
    // classic shape): ORDER BY DESC(?v) ?e LIMIT 3 compiles to ONE
    // row_number over the close partition; deterministic tiebreak on ?e
    "stream_window_topk" -> ((s, dir) =>
      new DistributedRsp(s, windowTopkQuery)
        .emissions(eventTriplesWithValue(s, dir))
        .select("close", "e", "v", "u")),

    // 10×-density window-plane bench entry (VERDICT r5 item 6): the
    // regular stream_* entries finish in ~1-2 s at sf0.1, dominated by
    // fixed job overhead, so window-plane regressions hide under noise.
    // Same span, 10× events (ids shifted, ts jittered +13 ms/copy — the
    // Sf1Probe replication), full distributed BGP + ISTREAM diff.
    // r7: HASH-CHECKED — the copy expansion is deterministic arithmetic
    // over the events table, so the DuckDB oracle rebuilds the exact
    // dense feed with an unnest(0..9) cross join and runs the same
    // ISTREAM consecutive-fired-close diff as stream_window_istream
    // (closing the last bench-headline rows-only gap, VERDICT r6 item 3).
    "stream_window_istream_dense" -> ((s, dir) =>
      new DistributedRsp(s, windowBgpQuery.copy(kind = graft.sparql.Ast.IStream))
        .emissions(denseEventTriples(s, dir))
        .select("close", "e", "u")),

    // multi-window Wait ISTREAM with UNEQUAL steps (1h vs 2h sliding):
    // the emission schedule is the Wait-cycle orbit (each cycle completes
    // when the laggard window fires; the other contributes its latest
    // fired close), diffed between consecutive emissions — previously a
    // loud refusal on the distributed plane (VERDICT r5 item 5)
    "stream_multiwindow_istream" -> ((s, dir) =>
      new DistributedRsp(s, multiWindowIStreamQuery)
        .emissions(eventTriples(s, dir))
        .select("close", "e", "e2", "u")),

    // RSP-protocol smoke IN the driver surface (VERDICT r8 item 5) — the
    // streaming half of http_sparql_smoke: the stream_window_bgp query is
    // REGISTERED over HTTP, a deterministic 300-event slice of the events
    // feed is POSTed through /rsp/push (two triples per event, one push
    // per event timestamp, ascending), and the emitted bindings are read
    // back off the /rsp/events SSE channel (reading until one firing
    // marker per push has arrived — the protocol's completion signal).
    // The distinct (e, u) result hash-checks against the SAME fired-window
    // oracle as stream_window_bgp, sliced identically — proving register →
    // push → firing → SSE serialization end-to-end, not just liveness.
    // WITH POLICY steal routes to the driver engine plane (single window:
    // Steal ≡ Wait — sync policies only differ across multiple windows);
    // the distributed plane's SSE parity is pinned in HttpServerSpec.
    "http_rsp_smoke" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StructField, StructType, StringType}
      val e = graft.streaming.EventsReader.eventsMs(s, dir)
      // bounded deterministic feed: the 60 earliest events by (tms, eid)
      // — a protocol smoke, not a throughput leg (dedup_minhash_stream
      // carries that), so the push count is constant at every SF. 60, not
      // 300 (r9): each distinct timestamp is one HTTP push paying a full
      // engine round, and 300 made this entry the largest non-load bench
      // line (15.9 s) while measuring protocol round-trips, not operators
      // (VERDICT r9 item 8) — 60 keeps the multi-firing window sequence
      // (several 1 h closes inside the 2 h range) at ~1/5 the wall
      val feed = e.select(col("tms"),
          concat(lit("event/"), col("event_id")).as("eid"),
          concat(lit("user/"), col("user_id")).as("uid"), col("event_type"))
        .orderBy(col("tms").asc, col("eid").asc).limit(60).collect()
      val srv = new graft.server.GraftHttpServer(s).start()
      try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        def post(path: String, body: com.fasterxml.jackson.databind.node.ObjectNode) = {
          val resp = httpClient.send(
            java.net.http.HttpRequest
              .newBuilder(new java.net.URI(s"http://localhost:${srv.port}$path"))
              .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.toString))
              .build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200,
            s"http_rsp_smoke: HTTP ${resp.statusCode()} on $path: ${resp.body().take(200)}")
          mapper.readTree(resp.body())
        }
        val reg = mapper.createObjectNode()
        reg.put("query", """
          REGISTER RSTREAM <http://out/windowed> AS
          SELECT *
          FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
            WITH POLICY steal
          WHERE { WINDOW :w { ?e <ev/user> ?u . ?e <ev/type> "purchase" . } }""")
        val sid = post("/rsp/register", reg).get("session_id").asText()
        var pushes = 0
        feed.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach { case (ts, evs) =>
          val nt = evs.map { r =>
            s"<${r.getString(1)}> <ev/user> <${r.getString(2)}> .\n" +
              s"<${r.getString(1)}> <ev/type> \"${r.getString(3)}\" ."
          }.mkString("\n")
          val p = mapper.createObjectNode()
          p.put("session_id", sid); p.put("stream", "events")
          p.put("timestamp", ts); p.put("ntriples", nt)
          post("/rsp/push", p)
          pushes += 1
        }
        // SSE: the queue replays rows emitted before the client connects;
        // one firing marker per push bounds the read deterministically
        val conn = new java.net.URI(
          s"http://localhost:${srv.port}/rsp/events/$sid").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setReadTimeout(60000)
        require(conn.getResponseCode == 200, s"SSE HTTP ${conn.getResponseCode}")
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
        val rows = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
        var firings = 0
        var event: String = null
        while (firings < pushes) {
          val l = reader.readLine()
          require(l != null, s"SSE closed after $firings/$pushes firings")
          if (l.startsWith("event:")) event = l.stripPrefix("event:").trim
          else if (l.startsWith("data:")) {
            if (event == "firing") firings += 1
            else {
              val n = mapper.readTree(l.stripPrefix("data:").trim)
              rows += ((n.get("e").asText(), n.get("u").asText()))
            }
            event = null
          }
        }
        conn.disconnect()
        val out = new java.util.ArrayList[Row]()
        rows.foreach { case (ee, uu) => out.add(Row(ee, uu)) }
        s.createDataFrame(out, StructType(Seq(
          StructField("e", StringType), StructField("u", StringType))))
      } finally srv.stop()
    }),

    // cross-window SDS+ on the distributed plane: every hourly step's
    // expiry-annotated materialization in ONE step-keyed fixpoint — a
    // user is flagged at a step while BOTH a purchase and a view support
    // live there (α = 2 h), tag = the weakest support's expiry
    // (⊗ = min across premises, ⊕ = max across derivations)
    "stream_cross_window_sds" -> ((s, dir) => {
      val H = 3600000L
      val ev = graft.streaming.EventsReader.eventsMs(s, dir)
      val content = ev.select(
        (col("tms") - (col("tms") % H)).as("step"),
        concat(lit("user/"), col("user_id")).as("s"),
        lit("did").as("p"), col("event_type").as("o"),
        col("tms").as("event_time"))
      val steps = content.select("step").distinct()
        .withColumn("now", col("step") + H)
      val rule = graft.sparql.SparqlParser().parseRule(
        """RULE <r/both> :- CONSTRUCT { ?u <flag> "both" }
           WHERE { ?u <did> "purchase" . ?u <did> "view" }""")
      graft.reasoner.CrossWindowDistributed
        .materializeSteps(steps, content, Seq(rule), alphaMs = 2 * H)
        .filter(col("p") === "flag")
        .select(col("step").as("close"), col("s").as("u"), col("tag"))
    }))

  private val windowBgpQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/windowed> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w { ?e <ev/user> ?u . ?e <ev/type> "purchase" . } }""")

  private val windowPathQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/windowpath> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w { ?t (^<ev/type>/<ev/user>) ?u . } }""")

  private val windowBindValuesQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/bindvalues> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w {
        ?e <ev/type> ?t .
        BIND(CONCAT("type:", ?t) AS ?tag)
        VALUES (?t) { ("purchase") ("view") }
      } }""")

  private val windowAggHavingQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/havagg> AS
      SELECT ?u (COUNT(?e) AS ?n)
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w { ?e <ev/user> ?u . ?e <ev/type> "purchase" . } }
      GROUP BY ?u HAVING(COUNT(?e) >= 2)""")

  private val windowTopkQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/topk> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w {
        { SELECT ?e ?v WHERE { ?e <ev/value> ?v } ORDER BY DESC(?v) ?e LIMIT 3 }
        ?e <ev/user> ?u .
      } }""")

  private val multiWindowIStreamQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER ISTREAM <http://out/mw> AS
      SELECT *
      FROM NAMED WINDOW :w1 ON :events [RANGE 7200000 ms STEP 3600000 ms]
      FROM NAMED WINDOW :w2 ON :events [RANGE 14400000 ms STEP 7200000 ms]
      WHERE {
        WINDOW :w1 { ?e <ev/user> ?u . ?e <ev/type> "purchase" . }
        WINDOW :w2 { ?e2 <ev/user> ?u . ?e2 <ev/type> "view" . }
      }""")

  private val windowFilterQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/filtered> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w { ?e <ev/user> ?u . ?e <ev/value> ?v . FILTER(?v >= 150) } }""")

  private val windowUnionQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/unioned> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w {
        { ?e <ev/user> ?u . ?e <ev/type> "purchase" . }
        UNION
        { ?e <ev/user> ?u . ?e <ev/type> "error" . }
      } }""")

  private val windowOptionalQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/opt> AS
      SELECT *
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w {
        ?e <ev/user> ?u . ?e <ev/type> "purchase" .
        OPTIONAL { ?e <ev/flag> ?f }
      } }""")

  private val windowAggQuery: graft.sparql.Ast.RspQuery =
    graft.sparql.SparqlParser().parseRsp("""
      REGISTER RSTREAM <http://out/agg> AS
      SELECT ?u (COUNT(?e) AS ?n)
      FROM NAMED WINDOW :w ON :events [RANGE 7200000 ms STEP 3600000 ms]
      WHERE { WINDOW :w { ?e <ev/user> ?u . ?e <ev/type> "purchase" . } }
      GROUP BY ?u""")

  /** Events triplized for the RSP plane: `(stream, ts: long ms, s, p, o)`.
    * `tms` is the exact epoch-ms axis from [[graft.streaming.EventsReader]]. */
  private def eventTriples(s: SparkSession, dir: String): DataFrame = {
    val e = graft.streaming.EventsReader.eventsMs(s, dir)
    val subj = concat(lit("event/"), col("event_id"))
    e.select(lit("events").as("stream"), col("tms").as("ts"),
        subj.as("s"), lit("ev/user").as("p"),
        concat(lit("user/"), col("user_id")).as("o"))
      .unionByName(e.select(lit("events").as("stream"), col("tms").as("ts"),
        subj.as("s"), lit("ev/type").as("p"), col("event_type").as("o")))
  }

  /** [[eventTriples]] at 10× density: each copy shifts ids and jitters ts
    * by 13 ms — more rows per window, the same #closes, which is how
    * event volume actually scales against a fixed window spec.
    *
    * Materialized ONCE per corpus to a /tmp parquet (the [[graft.relational.Triplizer]]
    * cachedStore discipline — the feed is deterministic arithmetic over
    * events, and the DuckDB oracle rebuilds the SAME rows in SQL, so the
    * cache is pure data loading): the previous per-call localCheckpoint
    * rebuilt and block-cached the 20-way union's ~20 M rows on EVERY
    * bench rep, and that allocate-then-drop churn — not the windowed
    * query itself — was the measured source of the entry's 4→11 s
    * wander (r6 VERDICT watch item 2; medians stabilize once emissions()
    * reads the feed from parquet). */
  private def denseEventTriples(s: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(dir)
    val h = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(f.getCanonicalPath))
    val path = s"/tmp/graft_dense_feed/${f.getName}_$h"
    if (!new java.io.File(path, "_SUCCESS").exists())
      denseEventTriples0(s, dir).repartition(16)
        .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  private def denseEventTriples0(s: SparkSession, dir: String): DataFrame = {
    val e = graft.streaming.EventsReader.eventsMs(s, dir)
    val copies = (0 until 10).map { cp =>
      e.select((col("event_id") + lit(cp.toLong * 100000000L)).as("event_id"),
        (col("tms") + lit(cp.toLong * 13L)).as("tms"),
        (col("user_id") + lit(cp.toLong * 1000000L)).as("user_id"),
        col("event_type"))
    }.reduce(_ unionByName _)
    val subj = concat(lit("event/"), col("event_id"))
    copies.select(lit("events").as("stream"), col("tms").as("ts"),
        subj.as("s"), lit("ev/user").as("p"),
        concat(lit("user/"), col("user_id")).as("o"))
      .unionByName(copies.select(lit("events").as("stream"), col("tms").as("ts"),
        subj.as("s"), lit("ev/type").as("p"), col("event_type").as("o")))
  }

  /** [[eventTriples]] plus an `ev/value` triple per event. The lexical
    * form is floor(value) as an integer string — exact and formatted
    * identically by Spark and DuckDB, so the FILTER entry stays
    * hash-comparable (double→string formatting is not portable). */
  private def eventTriplesWithValue(s: SparkSession, dir: String): DataFrame = {
    val e = graft.streaming.EventsReader.eventsMs(s, dir)
    val subj = concat(lit("event/"), col("event_id"))
    eventTriples(s, dir).unionByName(
      e.select(lit("events").as("stream"), col("tms").as("ts"),
        subj.as("s"), lit("ev/value").as("p"),
        floor(col("value")).cast("long").cast("string").as("o")))
  }

  /** [[eventTriples]] plus an `ev/flag "hi"` triple for events whose
    * floor(value) ≥ 150 — the selective predicate the OPTIONAL entry
    * binds against. */
  private def eventTriplesWithFlag(s: SparkSession, dir: String): DataFrame = {
    val e = graft.streaming.EventsReader.eventsMs(s, dir)
    val subj = concat(lit("event/"), col("event_id"))
    eventTriples(s, dir).unionByName(
      e.filter(floor(col("value")) >= 150)
        .select(lit("events").as("stream"), col("tms").as("ts"),
          subj.as("s"), lit("ev/flag").as("p"), lit("hi").as("o")))
  }

  private val wstartHour =
    """strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"""

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling_agg" ->
      s"""SELECT $wstartHour AS wstart, event_type,
                 COUNT(*) AS n, ROUND(SUM(value), 4) AS sv
          FROM events GROUP BY 1, 2""",

    "stream_sliding_agg" ->
      """WITH g AS (SELECT *,
              date_trunc('hour', ts) +
                CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                     ELSE INTERVAL 0 MINUTE END AS grid
            FROM events),
          e AS (SELECT g.*, grid - k.k * INTERVAL 30 MINUTE AS ws
                FROM g, (SELECT unnest([0, 1, 2, 3]) AS k) k)
          SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
                 COUNT(*) AS n, ROUND(SUM(value), 4) AS sv
          FROM e GROUP BY 1, 2""",

    "stream_istream" ->
      s"""WITH rel AS (SELECT DISTINCT $wstartHour AS wstart, event_type FROM events)
          SELECT r.wstart, r.event_type FROM rel r
          WHERE NOT EXISTS (
            SELECT 1 FROM rel p WHERE p.event_type = r.event_type
              AND strptime(p.wstart, '%Y-%m-%d %H:%M:%S') =
                  strptime(r.wstart, '%Y-%m-%d %H:%M:%S') - INTERVAL 1 HOUR)""",

    "stream_dstream" ->
      s"""WITH rel AS (SELECT DISTINCT $wstartHour AS wstart, event_type FROM events)
          SELECT strftime(strptime(p.wstart, '%Y-%m-%d %H:%M:%S') + INTERVAL 1 HOUR,
                          '%Y-%m-%d %H:%M:%S') AS wstart,
                 p.event_type
          FROM rel p
          WHERE NOT EXISTS (
            SELECT 1 FROM rel c WHERE c.event_type = p.event_type
              AND strptime(c.wstart, '%Y-%m-%d %H:%M:%S') =
                  strptime(p.wstart, '%Y-%m-%d %H:%M:%S') + INTERVAL 1 HOUR)
            AND EXISTS (
              SELECT 1 FROM rel f
              WHERE strptime(f.wstart, '%Y-%m-%d %H:%M:%S') =
                    strptime(p.wstart, '%Y-%m-%d %H:%M:%S') + INTERVAL 1 HOUR)""",

    // session_window splits when the gap is >= 12h (the window is
    // [first, last + gap)); ms-truncated on both sides
    "stream_session_agg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms, value
                    FROM events),
          g AS (SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                                 OR tms - lag(tms) OVER w >= 43200000
                               THEN 1 ELSE 0 END AS brk
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
          s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                  ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
                FROM g)
          SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS sv,
                 MIN(tms) AS sstart, MAX(tms) + 43200000 AS send
          FROM s GROUP BY user_id, sid""",

    "stream_window_bgp" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u
          FROM ev JOIN fired f
            ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
          WHERE ev.event_type = 'purchase'""",

    // the SSE smoke's slice of the same fired-window semantics: the 300
    // earliest events by (tms, eid) — the engine fires, per event, the
    // max STEP-multiple close strictly below its ts (RspEngine.advance),
    // which is exactly the per-event floor-close set below; the DISTINCT
    // (e, u) projection matches the smoke's dedup of RSTREAM re-emissions
    "http_rsp_smoke" ->
      s"""WITH ev0 AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                              'user/' || CAST(user_id AS VARCHAR) AS uid,
                              event_type,
                              CAST(epoch_ms(ts) AS BIGINT) AS tms
                       FROM events),
          ev AS (SELECT * FROM ev0 ORDER BY tms, eid LIMIT 60),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT ev.eid AS e, ev.uid AS u
          FROM ev JOIN fired f
            ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
          WHERE ev.event_type = 'purchase'""",

    "stream_window_path" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT f.close, ev.event_type AS t, ev.uid AS u
          FROM ev JOIN fired f
            ON ev.tms <= f.close AND ev.tms >= f.close - 7200000""",

    "stream_window_bind_values" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT f.close, ev.eid AS e, ev.event_type AS t,
                 'type:' || ev.event_type AS tag
          FROM ev JOIN fired f
            ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
          WHERE ev.event_type IN ('purchase', 'view')""",

    "stream_window_istream" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev)),
          rel AS (SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u
                  FROM ev JOIN fired f
                    ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
                  WHERE ev.event_type = 'purchase'),
          seq AS (SELECT close, LAG(close) OVER (ORDER BY close) AS prev
                  FROM fired)
          SELECT r.close, r.e, r.u
          FROM rel r JOIN seq s ON r.close = s.close
          WHERE s.prev IS NULL OR NOT EXISTS (
            SELECT 1 FROM rel p
            WHERE p.close = s.prev AND p.e = r.e AND p.u = r.u)""",

    // same ISTREAM oracle over the SQL-rebuilt 10x dense feed (copy cp:
    // event_id + cp*1e8, user_id + cp*1e6, tms + cp*13 — exactly
    // denseEventTriples0's arithmetic)
    "stream_window_istream_dense" ->
      s"""WITH ev0 AS (SELECT event_id, user_id, event_type,
                              CAST(epoch_ms(ts) AS BIGINT) AS tms0
                       FROM events),
          ev AS (SELECT 'event/' || CAST(event_id + cp.cp * 100000000 AS VARCHAR) AS eid,
                        'user/' || CAST(user_id + cp.cp * 1000000 AS VARCHAR) AS uid,
                        event_type,
                        tms0 + cp.cp * 13 AS tms
                 FROM ev0,
                      (SELECT unnest([0,1,2,3,4,5,6,7,8,9]) AS cp) cp),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev)),
          rel AS (SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u
                  FROM ev JOIN fired f
                    ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
                  WHERE ev.event_type = 'purchase'),
          seq AS (SELECT close, LAG(close) OVER (ORDER BY close) AS prev
                  FROM fired)
          SELECT r.close, r.e, r.u
          FROM rel r JOIN seq s ON r.close = s.close
          WHERE s.prev IS NULL OR NOT EXISTS (
            SELECT 1 FROM rel p
            WHERE p.close = s.prev AND p.e = r.e AND p.u = r.u)""",

    "stream_window_filter" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             CAST(FLOOR(value) AS BIGINT) AS vint,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u,
                 CAST(ev.vint AS VARCHAR) AS v
          FROM ev JOIN fired f
            ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
          WHERE ev.vint >= 150""",

    "stream_window_optional" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(FLOOR(value) AS BIGINT) AS vint,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT fc.close, ev.eid AS e, ev.uid AS u,
                 CASE WHEN ev.vint >= 150 THEN 'hi' ELSE NULL END AS f
          FROM ev JOIN fired fc
            ON ev.tms <= fc.close AND ev.tms >= fc.close - 7200000
          WHERE ev.event_type = 'purchase'""",

    "stream_window_agg" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev)),
          rel AS (SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u
                  FROM ev JOIN fired f
                    ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
                  WHERE ev.event_type = 'purchase')
          SELECT close, u, COUNT(e) AS n FROM rel GROUP BY close, u""",

    "stream_window_union" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev))
          SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u
          FROM ev JOIN fired f
            ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
          WHERE ev.event_type IN ('purchase', 'error')""",

    "stream_window_agg_having" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev)),
          rel AS (SELECT DISTINCT f.close, ev.eid AS e, ev.uid AS u
                  FROM ev JOIN fired f
                    ON ev.tms <= f.close AND ev.tms >= f.close - 7200000
                  WHERE ev.event_type = 'purchase')
          SELECT close, u, COUNT(e) AS n FROM rel GROUP BY close, u
          HAVING COUNT(e) >= 2""",

    "stream_window_topk" ->
      s"""WITH ev AS (SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                             'user/' || CAST(user_id AS VARCHAR) AS uid,
                             CAST(FLOOR(value) AS BIGINT) AS vint,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms
                      FROM events),
          fired AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS close
                    FROM ev
                    WHERE (tms - 1) - ((tms - 1) % 3600000) >=
                          (SELECT MIN(tms) FROM ev)),
          content AS (SELECT f.close, ev.eid, ev.uid, ev.vint
                      FROM ev JOIN fired f
                        ON ev.tms <= f.close AND ev.tms >= f.close - 7200000),
          ranked AS (SELECT close, eid, uid, vint,
                       ROW_NUMBER() OVER (PARTITION BY close
                                          ORDER BY vint DESC, eid) AS rn
                     FROM content)
          SELECT close, eid AS e, CAST(vint AS VARCHAR) AS v, uid AS u
          FROM ranked WHERE rn <= 3""",

    // Wait-cycle recurrence as a recursive CTE: e₀ = max of the two first
    // fired closes; each next emission = max of the two next-fired-closes
    // after the previous one; every window contributes its greatest fired
    // close ≤ the emission (as-of); ISTREAM diffs consecutive emissions
    "stream_multiwindow_istream" ->
      s"""WITH RECURSIVE ev AS (
            SELECT 'event/' || CAST(event_id AS VARCHAR) AS eid,
                   'user/' || CAST(user_id AS VARCHAR) AS uid,
                   event_type,
                   CAST(epoch_ms(ts) AS BIGINT) AS tms
            FROM events),
          f1 AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 3600000) AS c FROM ev
                 WHERE (tms - 1) - ((tms - 1) % 3600000) >= (SELECT MIN(tms) FROM ev)),
          f2 AS (SELECT DISTINCT (tms - 1) - ((tms - 1) % 7200000) AS c FROM ev
                 WHERE (tms - 1) - ((tms - 1) % 7200000) >= (SELECT MIN(tms) FROM ev)),
          emis(c) AS (
            SELECT GREATEST((SELECT MIN(c) FROM f1), (SELECT MIN(c) FROM f2))
            UNION ALL
            SELECT GREATEST((SELECT MIN(x.c) FROM f1 x WHERE x.c > e.c),
                            (SELECT MIN(x.c) FROM f2 x WHERE x.c > e.c))
            FROM emis e
            WHERE (SELECT MIN(x.c) FROM f1 x WHERE x.c > e.c) IS NOT NULL
              AND (SELECT MIN(x.c) FROM f2 x WHERE x.c > e.c) IS NOT NULL),
          srcs AS (SELECT c AS close,
            (SELECT MAX(x.c) FROM f1 x WHERE x.c <= emis.c) AS s1,
            (SELECT MAX(x.c) FROM f2 x WHERE x.c <= emis.c) AS s2 FROM emis),
          rel AS (
            SELECT DISTINCT sr.close, p.eid AS e, v.eid AS e2, p.uid AS u
            FROM srcs sr
            JOIN ev p ON p.tms <= sr.s1 AND p.tms >= sr.s1 - 7200000
                     AND p.event_type = 'purchase'
            JOIN ev v ON v.tms <= sr.s2 AND v.tms >= sr.s2 - 14400000
                     AND v.event_type = 'view' AND v.uid = p.uid),
          seq AS (SELECT close, LAG(close) OVER (ORDER BY close) AS prev FROM srcs)
          SELECT r.close, r.e, r.e2, r.u
          FROM rel r JOIN seq s ON r.close = s.close
          WHERE s.prev IS NULL OR NOT EXISTS (
            SELECT 1 FROM rel p2
            WHERE p2.close = s.prev AND p2.e = r.e AND p2.e2 = r.e2 AND p2.u = r.u)""",

    // derived tag = max over (purchase, view) pairs of min(expiries)
    // = LEAST(MAX purchase expiry, MAX view expiry) — the min-max
    // semiring's distributive identity makes the oracle closed-form
    "stream_cross_window_sds" ->
      s"""WITH ev AS (SELECT 'user/' || CAST(user_id AS VARCHAR) AS u,
                             event_type,
                             CAST(epoch_ms(ts) AS BIGINT) AS tms,
                             CAST(epoch_ms(ts) AS BIGINT)
                               - (CAST(epoch_ms(ts) AS BIGINT) % 3600000) AS bucket
                      FROM events),
          steps AS (SELECT DISTINCT bucket AS step, bucket + 3600000 AS now FROM ev),
          vis AS (SELECT st.step, ev.u, ev.event_type, ev.tms + 7200000 AS tag
                  FROM steps st JOIN ev
                    ON ev.bucket <= st.step AND ev.tms + 7200000 > st.now),
          p AS (SELECT step, u, MAX(tag) AS ptag FROM vis
                WHERE event_type = 'purchase' GROUP BY 1, 2),
          v AS (SELECT step, u, MAX(tag) AS vtag FROM vis
                WHERE event_type = 'view' GROUP BY 1, 2)
          SELECT p.step AS close, p.u,
                 CAST(LEAST(p.ptag, v.vtag) AS DOUBLE) AS tag
          FROM p JOIN v ON p.step = v.step AND p.u = v.u""")
}
