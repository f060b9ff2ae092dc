package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic relational analytics directly on the parquet tables — the
  * engine's DataFrame-native mode (no triplization). TPC-H-shaped
  * pricing-summary / shipping-priority / local-supplier / forecast-revenue
  * queries, used both as correctness entries and as bench anchors.
  *
  * Scale notes: filters and projections sit directly on the scan
  * (PushedFilters in explain), dimension joins are broadcast, aggregates
  * are partial (map-side) by construction.
  */
object RelationalSuite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: pricing summary over lineitem
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape: top unshipped orders by revenue
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1997-06-01"))
      val li = t(s, dir, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
    }),

    // TPC-H Q5 shape: revenue by nation within one region
    "q5_local_supplier" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey") &&
          sup("s_nationkey") === cust("c_nationkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc)
    }),

    // TPC-H Q6 shape: forecast revenue change (pure scan+filter+agg)
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.03, 0.05) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))),

    // TPC-H Q4 shape: order-priority counts gated by an EXISTS semi-join
    // (this lineitem has no commit/receipt dates, so the existence
    // predicate is "some returned line item")
    "q4_priority_count" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-07-01"))
      val returned = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      ord.join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q10 shape: top customers by returned-item revenue
    "q10_returned_items" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-07-01"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q17 shape: small-quantity-order revenue. Deliberately written
    // as SQL with the correlated scalar subquery intact — this drives
    // Catalyst's subquery decorrelation (RewriteCorrelatedScalarSubquery
    // plans it as an aggregate + join), which the DataFrame entries never
    // exercise. This data's part table has no p_container, so the filter
    // is brand-only.
    "q17_small_qty_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g17_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g17_part")
      s.sql(
        """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
           FROM g17_lineitem JOIN g17_part ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#23'
             AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                               FROM g17_lineitem l2
                               WHERE l2.l_partkey = p_partkey)""")
    }),

    // decorrelated-aggregate shape: parts priced above their type average
    "q_above_avg_parts" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val typeAvg = part.groupBy(col("p_type").as("t_type"))
        .agg(avg("p_retailprice").as("avg_price"))
      part.join(broadcast(typeAvg), col("p_type") === col("t_type"))
        .filter(col("p_retailprice") > col("avg_price") * 1.01)
        .select(col("p_partkey"), col("p_type"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
    }),

    // point-in-time join: each purchase picks the latest prior view of
    // the same user (union-tag + window — ONE key shuffle, no range-join
    // pair explosion; the DuckDB oracle IS the quadratic inequality join
    // this shape avoids). graft.pipeline.EventOps.asOfJoinBackward.
    "events_asof_join" -> ((s, dir) => {
      val ev = graft.streaming.EventsReader.eventsMs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tms"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("tms"), round(col("value"), 6).as("value"))
      graft.pipeline.EventOps
        .asOfJoinBackward(purchases, views, Seq("user_id"), "tms", "tms", Seq("value"))
    }),

    // interval join: every view of the same user in the six hours strictly
    // before each purchase — the time-bucket-blocked range join (never
    // the per-user nested loop a raw inequality join plans)
    "events_interval_join" -> ((s, dir) => {
      val ev = graft.streaming.EventsReader.eventsMs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tms"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("tms"),
          round(col("value"), 6).as("value"))
      graft.pipeline.EventOps.intervalJoin(purchases, views, Seq("user_id"),
        "tms", "tms", loMs = -21600000L, hiMs = -1L, Seq("view_id", "value"))
    }),

    // trailing 6 h per-user activity profile at every event (RANGE frame
    // — simultaneous events aggregate together on both engines; sums in
    // integer micro-units for accumulation-order independence)
    "events_rolling_agg" -> ((s, dir) => {
      val ev = graft.streaming.EventsReader.eventsMs(s, dir)
      graft.pipeline.EventOps.rollingAgg(ev, "user_id", "tms", "value",
          windowMs = 21600000L)
        .select("event_id", "user_id", "tms", "n_window", "sum_micro")
    }),

    // first-touch conversion funnel view → click → purchase: each stage
    // time is the user's earliest such event strictly after the previous
    // stage's time; one user_id shuffle for the whole chain
    "events_funnel" -> ((s, dir) => {
      val ev = graft.streaming.EventsReader.eventsMs(s, dir)
      graft.pipeline.EventOps.funnel(ev, "user_id", "tms", "event_type",
        Seq("view", "click", "purchase"))
    }),

    // gap-based sessionization: 12 h inactivity closes a session; the
    // session assignment (lag + running sum) and the per-session
    // aggregate share one user_id shuffle.
    "events_sessionize" -> ((s, dir) => {
      val ev = graft.streaming.EventsReader.eventsMs(s, dir)
      graft.pipeline.EventOps.sessions(ev, "user_id", "tms",
        gapMs = 12L * 3600 * 1000, valueCol = "value", tiebreak = Seq("event_id"))
    }),

    // PageRank over the order→part→supplier multigraph (Pregel-as-join:
    // one edge join + one dst aggregation per iteration, dangling mass
    // redistributed). Node ids are TAGGED LONGS (key*4 + type) — long
    // equi-joins and aggregations run several times faster than the
    // string-concat ids this entry first shipped with (measured 8.2 s →
    // see SURVEY §9). The oracle unrolls the same three iterations.
    "graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val edges = li.select((col("l_orderkey") * 4).as("src"),
          (col("l_partkey") * 4 + 1).as("dst"))
        .unionAll(li.select((col("l_partkey") * 4 + 1).as("src"),
          (col("l_suppkey") * 4 + 2).as("dst")))
      // 3 iterations: the one-action no-round-checkpoint form (measured
      // fastest; deep iteration counts would flip the flag back on)
      graft.pipeline.GraphOps.pageRank(edges, iters = 3, checkpoint = false)
    }),

    // per-node triangle counts over the order-part-supplier co-occurrence
    // graph (all three edge types, so order-part-supplier closures from
    // DIFFERENT lineitem rows form real triangles)
    "graph_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val edges = li.select((col("l_orderkey") * 4).as("src"),
          (col("l_partkey") * 4 + 1).as("dst"))
        .unionAll(li.select((col("l_partkey") * 4 + 1).as("src"),
          (col("l_suppkey") * 4 + 2).as("dst")))
        .unionAll(li.select((col("l_orderkey") * 4).as("src"),
          (col("l_suppkey") * 4 + 2).as("dst")))
      graft.pipeline.GraphOps.triangleCounts(edges)
    }),

    // connected components over a SPARSE order-part subgraph (qty > 48
    // keeps the bipartite graph subcritical — mean-degree product < 1 at
    // every scale factor, so components stay small and the recursive-CTE
    // oracle stays cheap); component = min reachable node id via
    // hash-min pointer doubling
    "graph_components" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 48)
      val edges = li.select((col("l_orderkey") * 4).as("src"),
        (col("l_partkey") * 4 + 1).as("dst"))
      val cc = graft.pipeline.GraphOps.connectedComponents(edges)
      cc.groupBy("component").agg(count(lit(1)).as("csize"))
        .join(cc, Seq("component"))
        .select(col("node"), col("component"), col("csize"))
    }),

    // 2-hop BFS neighborhood of the first five supplier nodes over the
    // full (dense) co-occurrence graph — bounded-depth frontier
    // expansion, min hop count per reached node
    "graph_bfs_hops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val edges = li.select((col("l_orderkey") * 4).as("src"),
          (col("l_partkey") * 4 + 1).as("dst"))
        .unionAll(li.select((col("l_partkey") * 4 + 1).as("src"),
          (col("l_suppkey") * 4 + 2).as("dst")))
        .unionAll(li.select((col("l_orderkey") * 4).as("src"),
          (col("l_suppkey") * 4 + 2).as("dst")))
      val sources = t(s, dir, "supplier").filter(col("s_suppkey") < 5)
        .select((col("s_suppkey") * 4 + 2).as("node"))
      graft.pipeline.GraphOps.bfsDistances(edges, sources, maxHops = 2)
    }),

    // Bloom-pruned semi join: customers with at least one URGENT order.
    // The build side's keys fold into Spark's native bloom_filter_agg
    // (one tiny binary sketch, broadcast as a one-row cross join) and
    // might_contain prunes the probe side BEFORE the shuffle — the
    // 100 TB runtime-filter pattern (a probe row whose key the bloom has
    // never seen is dropped at the scan, never shuffled). False
    // positives only cost pruning efficiency: the exact left-semi join
    // behind the filter confirms every survivor, so the result — and
    // the DuckDB EXISTS oracle — stays exact.
    "q_bloom_semijoin" -> ((s, dir) => {
      graft.functions.BloomFns.register(s)
      t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey").createOrReplaceTempView("g_bloom_urgent")
      t(s, dir, "customer").createOrReplaceTempView("g_bloom_cust")
      // might_contain requires the sketch as a scalar subquery (or
      // constant) — Spark plans it as its own tiny subquery stage whose
      // result feeds the probe-side filter, exactly how its internal
      // runtime row-filter rewrite injects blooms
      s.sql(
        """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
           FROM g_bloom_cust
           WHERE graft_might_contain(
                   (SELECT graft_bloom_agg(o_custkey, 100000L, 800000L)
                    FROM g_bloom_urgent), c_custkey)
             AND EXISTS (SELECT 1 FROM g_bloom_urgent u
                         WHERE u.o_custkey = c_custkey)""")
    }))

  val oracleSql: Map[String, String] = Map(
    // the bloom prefilter is pruning-only, so the oracle is the plain
    // exact semi join
    "q_bloom_semijoin" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                ROUND(SUM(l_quantity), 4) AS sum_qty,
                ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                ROUND(AVG(l_quantity), 4) AS avg_qty,
                ROUND(AVG(l_discount), 4) AS avg_disc,
                COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
                strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
                o_orderpriority,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q5_local_supplier" ->
      """SELECT n_name,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC""",

    "q6_forecast_revenue" ->
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24""",

    "q4_priority_count" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "q17_small_qty_revenue" ->
      """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#23'
           AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                             FROM lineitem l2
                             WHERE l2.l_partkey = part.p_partkey)""",

    "q_above_avg_parts" ->
      """SELECT p_partkey, p_type, ROUND(p_retailprice, 2) AS p_retailprice
         FROM part
         WHERE p_retailprice > 1.01 * (SELECT AVG(p2.p_retailprice) FROM part p2
                                       WHERE p2.p_type = part.p_type)""",

    // the inequality-join-then-rank formulation the Spark side avoids;
    // ties broken by (ts desc, value desc) = the union-tag window's
    // (ts asc, value asc) + last()
    "events_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS tms
                    FROM events WHERE event_type = 'purchase'),
          r AS (SELECT user_id, epoch_ms(ts) AS rms, round(value, 6) AS value
                FROM events WHERE event_type = 'view')
          SELECT l.event_id, l.user_id, l.tms,
                 r.rms AS matched_tms, r.value AS matched_value
          FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.rms <= l.tms
          QUALIFY row_number() OVER (PARTITION BY l.event_id
            ORDER BY r.rms DESC NULLS LAST, r.value DESC NULLS LAST) = 1""",

    "events_rolling_agg" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS tms,
                      CAST(round(value * 1000000) AS BIGINT) AS vmicro
                    FROM events)
          SELECT event_id, user_id, tms,
                 count(*) OVER w AS n_window,
                 CAST(sum(vmicro) OVER w AS BIGINT) AS sum_micro
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY tms
                       RANGE BETWEEN 21600000 PRECEDING AND CURRENT ROW)""",

    "events_interval_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS tms
                    FROM events WHERE event_type = 'purchase'),
          v AS (SELECT user_id, event_id AS view_id, epoch_ms(ts) AS vms,
                       round(value, 6) AS value
                FROM events WHERE event_type = 'view')
          SELECT p.event_id, p.user_id, p.tms,
                 v.view_id AS matched_view_id, v.value AS matched_value,
                 v.vms AS matched_tms
          FROM p JOIN v ON p.user_id = v.user_id
            AND v.vms BETWEEN p.tms - 21600000 AND p.tms - 1""",

    "events_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, event_type FROM events),
          a AS (SELECT user_id, min(tms) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY 1),
          b AS (SELECT e.user_id, min(tms) AS t_click FROM e
                JOIN a USING (user_id)
                WHERE event_type = 'click' AND tms > t_view GROUP BY 1),
          c AS (SELECT e.user_id, min(tms) AS t_purchase FROM e
                JOIN b USING (user_id)
                WHERE event_type = 'purchase' AND tms > t_click GROUP BY 1)
          SELECT a.user_id, t_view, t_click, t_purchase,
                 CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                           WHEN t_click IS NOT NULL THEN 2
                           ELSE 1 END AS INT) AS stages_reached
          FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)""",

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms, value
                    FROM events),
          g AS (SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                                 OR tms - lag(tms) OVER w > 43200000
                               THEN 1 ELSE 0 END AS brk
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
          s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                  ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS session_no
                FROM g)
          SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
                 min(tms) AS session_start, max(tms) AS session_end,
                 count(*) AS n_events, round(sum(value), 6) AS sum_value
          FROM s GROUP BY user_id, session_no""",

    // three power iterations unrolled; pr'(v) = 0.15/N + 0.85*(in(v) + D/N)
    // with D the dangling (supplier) mass — identical shapes per round
    "graph_pagerank" ->
      """WITH e AS (SELECT l_orderkey * 4 AS src, l_partkey * 4 + 1 AS dst
                    FROM lineitem
                    UNION ALL
                    SELECT l_partkey * 4 + 1, l_suppkey * 4 + 2 FROM lineitem),
          nodes AS (SELECT DISTINCT node FROM
                    (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          od AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outdeg
                 FROM e GROUP BY 1),
          base AS (SELECT nodes.node, od.outdeg FROM nodes LEFT JOIN od USING (node)),
          nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
          p0 AS (SELECT node, outdeg, 1.0 / (SELECT n FROM nn) AS pr FROM base),
          d1 AS (SELECT COALESCE(sum(pr), 0.0) AS d FROM p0 WHERE outdeg IS NULL),
          c1 AS (SELECT e.dst AS node, sum(p.pr / p.outdeg) AS cin
                 FROM e JOIN p0 p ON e.src = p.node GROUP BY e.dst),
          p1 AS (SELECT b.node, b.outdeg, 0.15 / (SELECT n FROM nn)
                   + 0.85 * (COALESCE(c.cin, 0.0) + (SELECT d FROM d1) / (SELECT n FROM nn)) AS pr
                 FROM base b LEFT JOIN c1 c USING (node)),
          d2 AS (SELECT COALESCE(sum(pr), 0.0) AS d FROM p1 WHERE outdeg IS NULL),
          c2 AS (SELECT e.dst AS node, sum(p.pr / p.outdeg) AS cin
                 FROM e JOIN p1 p ON e.src = p.node GROUP BY e.dst),
          p2 AS (SELECT b.node, b.outdeg, 0.15 / (SELECT n FROM nn)
                   + 0.85 * (COALESCE(c.cin, 0.0) + (SELECT d FROM d2) / (SELECT n FROM nn)) AS pr
                 FROM base b LEFT JOIN c2 c USING (node)),
          d3 AS (SELECT COALESCE(sum(pr), 0.0) AS d FROM p2 WHERE outdeg IS NULL),
          c3 AS (SELECT e.dst AS node, sum(p.pr / p.outdeg) AS cin
                 FROM e JOIN p2 p ON e.src = p.node GROUP BY e.dst),
          p3 AS (SELECT b.node, b.outdeg, 0.15 / (SELECT n FROM nn)
                   + 0.85 * (COALESCE(c.cin, 0.0) + (SELECT d FROM d3) / (SELECT n FROM nn)) AS pr
                 FROM base b LEFT JOIN c3 c USING (node))
          SELECT node, ROUND(pr, 6) AS pr FROM p3""",

    // ground truth enumerates each triangle once as x<y<z and explodes
    // its three corners; the Spark side's degree orientation enumerates
    // the same distinct triangle set, so per-node counts match exactly
    "graph_triangles" ->
      """WITH e0 AS (SELECT l_orderkey * 4 AS src, l_partkey * 4 + 1 AS dst
                     FROM lineitem
                     UNION ALL
                     SELECT l_partkey * 4 + 1, l_suppkey * 4 + 2 FROM lineitem
                     UNION ALL
                     SELECT l_orderkey * 4, l_suppkey * 4 + 2 FROM lineitem),
          e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                FROM e0 WHERE src <> dst),
          tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                  FROM e e1
                  JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
          c AS (SELECT unnest([x, y, z]) AS node FROM tri)
          SELECT node, count(*) AS triangles FROM c GROUP BY node""",

    // ground truth: full reachability closure (cheap because the qty>48
    // subgraph is subcritical), component = min reachable node incl self
    "graph_components" ->
      """WITH RECURSIVE e0 AS (SELECT l_orderkey * 4 AS src, l_partkey * 4 + 1 AS dst
                               FROM lineitem WHERE l_quantity > 48),
          e AS (SELECT DISTINCT src AS v, dst AS u FROM e0
                UNION SELECT DISTINCT dst, src FROM e0),
          r(v, u) AS (SELECT DISTINCT v, v FROM e
                      UNION
                      SELECT r.v, e.u FROM r JOIN e ON r.u = e.v),
          comp AS (SELECT v AS node, min(u) AS component FROM r GROUP BY v),
          sz AS (SELECT component, count(*) AS csize FROM comp GROUP BY 1)
          SELECT node, comp.component, csize FROM comp JOIN sz USING (component)""",

    // ground truth: bounded-depth path enumeration, min hop count per
    // node (sources at 0); depth cap matches the entry's maxHops
    "graph_bfs_hops" ->
      """WITH RECURSIVE e0 AS (SELECT l_orderkey * 4 AS src, l_partkey * 4 + 1 AS dst
                               FROM lineitem
                               UNION ALL
                               SELECT l_partkey * 4 + 1, l_suppkey * 4 + 2 FROM lineitem
                               UNION ALL
                               SELECT l_orderkey * 4, l_suppkey * 4 + 2 FROM lineitem),
          e AS (SELECT DISTINCT src AS v, dst AS u FROM e0 WHERE src <> dst
                UNION SELECT DISTINCT dst, src FROM e0 WHERE src <> dst),
          s AS (SELECT s_suppkey * 4 + 2 AS node FROM supplier WHERE s_suppkey < 5),
          b(node, dist) AS (SELECT node, 0 FROM s
                            UNION ALL
                            SELECT e.u, b.dist + 1 FROM b JOIN e ON b.node = e.v
                            WHERE b.dist < 2)
          SELECT node, CAST(min(dist) AS INT) AS dist FROM b GROUP BY node""")
}
