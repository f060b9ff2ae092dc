package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.relational.Triplizer
import graft.sparql.Compiler

/** WatDiv-shaped SPARQL workload (VERDICT r6 item 1).
  *
  * The reference's ONLY published benchmark is WatDiv L1-L5 / S1-S7 /
  * F1-F3 / C1-C3 (`/root/reference/README.md:1036-1055`, harness
  * `kolibrie/examples/sparql_syntax/n_triples_data/n_triple_10M.rs:12-25`).
  * Those query SHAPES — linear paths of 3-5 hops, 5-7-pattern subject
  * stars, snowflakes (several star hubs chained by FK hops), and complex
  * 8-12-pattern mixes — are exactly where a BGP planner either pays off
  * or face-plants: source-order joins on a 12-pattern snowflake start
  * from the least selective scan and drag the full corpus through every
  * hop. This suite expresses the four families over the triplized TPC-H
  * corpus (the FK graph gives the same shape vocabulary: lineitem is the
  * WatDiv "user" hub with 11 outgoing predicates, orders/part/supplier
  * are secondary hubs, nation→region is the 2-hop tail), each entry
  * hash-checked against DuckDB on the original relational tables.
  *
  * Planner posture (pinned by PlanPostureSpec): the greedy
  * selectivity-first pre-pass (`Compiler.greedyOrder`, mirroring the
  * reference's bound-position cost discounts `cost/estimator.rs:70-78`)
  * starts every chain at a constant-object pattern and only ever joins
  * connected patterns, so no query here plans a cartesian product
  * regardless of source order; Catalyst+AQE then pick the physical join
  * (broadcast for the nation/region tails at any scale — they are
  * dimension-sized by construction).
  */
object WatDivSuite {

  private def engine(spark: SparkSession, sfDir: String): Compiler =
    new Compiler(Triplizer.cachedStore(spark, sfDir, defaultGraph = true))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- L: linear paths (bound endpoint, 3-5 FK hops) -------------------
    // L1: 3 hops, constant tail — orders placed from region ASIA
    "sparql_watdiv_l1" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?o ?c WHERE {
          ?o <orders#o_custkey> ?c .
          ?c <customer#c_nationkey> ?n .
          ?n <nation#n_regionkey> ?r .
          ?r <region#r_name> "ASIA" }""")),

    // L2: 5 hops head-to-tail — returned lineitems up the full FK chain
    // to their region name (constant at the HEAD, chain walked forward)
    "sparql_watdiv_l2" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?rname WHERE {
          ?li <lineitem#l_returnflag> "R" .
          ?li <lineitem#l_orderkey> ?o .
          ?o <orders#o_custkey> ?c .
          ?c <customer#c_nationkey> ?n .
          ?n <nation#n_regionkey> ?r .
          ?r <region#r_name> ?rname }""")),

    // L3: 3 hops through the supplier leg, constant tail mid-chain
    "sparql_watdiv_l3" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?sup WHERE {
          ?li <lineitem#l_suppkey> ?sup .
          ?sup <supplier#s_nationkey> ?n .
          ?n <nation#n_name> "NATION_7" }""")),

    // --- S: subject stars (5-7 patterns on one hub) ----------------------
    // S1: 7-pattern star on the lineitem hub, one constant object
    "sparql_watdiv_s1" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?q ?price ?disc ?tax ?ls ?sd WHERE {
          ?li <lineitem#l_quantity> ?q .
          ?li <lineitem#l_extendedprice> ?price .
          ?li <lineitem#l_discount> ?disc .
          ?li <lineitem#l_tax> ?tax .
          ?li <lineitem#l_returnflag> "A" .
          ?li <lineitem#l_linestatus> ?ls .
          ?li <lineitem#l_shipdate> ?sd }""")),

    // S2: 5-pattern star on orders + numeric FILTER over a star attribute
    "sparql_watdiv_s2" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?o ?c ?st ?tp ?od WHERE {
          ?o <orders#o_custkey> ?c .
          ?o <orders#o_orderstatus> ?st .
          ?o <orders#o_totalprice> ?tp .
          ?o <orders#o_orderdate> ?od .
          ?o <orders#o_orderpriority> "1-URGENT" .
          FILTER(?tp > 100000.0) }""")),

    // --- F: snowflakes (two+ star hubs chained by FK hops) ---------------
    // F1: lineitem hub → orders hub + part hub, constants on both leaves
    "sparql_watdiv_f1" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?q ?st ?brand WHERE {
          ?li <lineitem#l_orderkey> ?ord .
          ?li <lineitem#l_partkey> ?p .
          ?li <lineitem#l_quantity> ?q .
          ?ord <orders#o_orderstatus> ?st .
          ?ord <orders#o_orderpriority> "2-HIGH" .
          ?p <part#p_brand> ?brand .
          ?p <part#p_type> "PROMO" }""")),

    // F2: 8 patterns — lineitem hub → supplier→nation→region tail + part
    // leaf, constant at the deepest tail
    "sparql_watdiv_f2" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?sname ?nname ?brand WHERE {
          ?li <lineitem#l_suppkey> ?sup .
          ?li <lineitem#l_partkey> ?p .
          ?sup <supplier#s_name> ?sname .
          ?sup <supplier#s_nationkey> ?n .
          ?n <nation#n_name> ?nname .
          ?n <nation#n_regionkey> ?r .
          ?r <region#r_name> "EUROPE" .
          ?p <part#p_brand> ?brand }""")),

    // --- C: complex mixes (8-12 patterns) --------------------------------
    // C1: 10 patterns — lineitem star + orders + customer star + nation,
    // IRI-constant object deep in the chain
    "sparql_watdiv_c1" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?q ?tp ?cname ?nname WHERE {
          ?li <lineitem#l_orderkey> ?ord .
          ?li <lineitem#l_quantity> ?q .
          ?li <lineitem#l_returnflag> "R" .
          ?li <lineitem#l_linestatus> "F" .
          ?ord <orders#o_custkey> ?c .
          ?ord <orders#o_totalprice> ?tp .
          ?c <customer#c_name> ?cname .
          ?c <customer#c_nationkey> ?n .
          ?n <nation#n_name> ?nname .
          ?n <nation#n_regionkey> <region/2> }""")),

    // C2: customer star + 2-hop tail + OPTIONAL order leg + FILTER
    "sparql_watdiv_c2" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?c ?cname ?bal ?nname ?ordp WHERE {
          ?c <customer#c_name> ?cname .
          ?c <customer#c_acctbal> ?bal .
          ?c <customer#c_mktsegment> "AUTOMOBILE" .
          ?c <customer#c_nationkey> ?n .
          ?n <nation#n_name> ?nname .
          ?n <nation#n_regionkey> ?r .
          ?r <region#r_name> "AFRICA" .
          OPTIONAL { ?ordp <orders#o_custkey> ?c .
                     ?ordp <orders#o_orderpriority> "1-URGENT" }
          FILTER(?bal > 0.0) }""")),

    // C3: 12 patterns, four hubs (lineitem, orders, part, supplier) plus
    // the customer→nation→region chain — the planner stress shape: source
    // order deliberately lists the unselective hub patterns FIRST and the
    // two constant-object patterns LAST
    "sparql_watdiv_c3" -> ((s, dir) =>
      engine(s, dir).select("""
        SELECT ?li ?brand ?sname ?cname ?rname WHERE {
          ?li <lineitem#l_orderkey> ?ord .
          ?li <lineitem#l_partkey> ?p .
          ?li <lineitem#l_suppkey> ?sup .
          ?ord <orders#o_custkey> ?c .
          ?p <part#p_brand> ?brand .
          ?sup <supplier#s_name> ?sname .
          ?c <customer#c_name> ?cname .
          ?c <customer#c_nationkey> ?n .
          ?n <nation#n_regionkey> ?r .
          ?r <region#r_name> ?rname .
          ?ord <orders#o_orderstatus> "F" .
          ?p <part#p_type> "MEDIUM" }""")))

  /** DuckDB mirror of Triplizer's lineitem row-fingerprint subject (keep
    * in sync with SparqlSuite.liSubj / Triplizer.subjectCol). */
  private val liSubj: String =
    """'lineitem/' || md5(CAST(l_orderkey AS VARCHAR) || '|' ||
       CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR) || '|' ||
       CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_quantity AS VARCHAR) || '|' ||
       CAST(l_extendedprice AS VARCHAR) || '|' || CAST(l_discount AS VARCHAR) || '|' ||
       CAST(l_tax AS VARCHAR) || '|' || l_returnflag || '|' || l_linestatus || '|' ||
       strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'))"""

  val oracleSql: Map[String, String] = Map(
    "sparql_watdiv_l1" ->
      """SELECT 'orders/' || CAST(o_orderkey AS VARCHAR) AS o,
                'customer/' || CAST(o_custkey AS VARCHAR) AS c
         FROM orders
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN region ON r_regionkey = n_regionkey
         WHERE r_name = 'ASIA'""",

    "sparql_watdiv_l2" ->
      s"""SELECT $liSubj AS li, r_name AS rname
         FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN region ON r_regionkey = n_regionkey
         WHERE l_returnflag = 'R'""",

    "sparql_watdiv_l3" ->
      s"""SELECT $liSubj AS li, 'supplier/' || CAST(l_suppkey AS VARCHAR) AS sup
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         WHERE n_name = 'NATION_7'""",

    "sparql_watdiv_s1" ->
      s"""SELECT $liSubj AS li,
                CAST(l_quantity AS VARCHAR) AS q,
                CAST(l_extendedprice AS VARCHAR) AS price,
                CAST(l_discount AS VARCHAR) AS disc,
                CAST(l_tax AS VARCHAR) AS tax,
                l_linestatus AS ls,
                strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS sd
         FROM lineitem WHERE l_returnflag = 'A'""",

    "sparql_watdiv_s2" ->
      """SELECT 'orders/' || CAST(o_orderkey AS VARCHAR) AS o,
                'customer/' || CAST(o_custkey AS VARCHAR) AS c,
                o_orderstatus AS st,
                CAST(o_totalprice AS VARCHAR) AS tp,
                strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
         FROM orders
         WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0""",

    "sparql_watdiv_f1" ->
      s"""SELECT $liSubj AS li,
                CAST(l_quantity AS VARCHAR) AS q,
                o_orderstatus AS st,
                p_brand AS brand
         FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
         WHERE o_orderpriority = '2-HIGH' AND p_type = 'PROMO'""",

    "sparql_watdiv_f2" ->
      s"""SELECT $liSubj AS li, s_name AS sname, n_name AS nname, p_brand AS brand
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN region ON r_regionkey = n_regionkey
         JOIN part ON p_partkey = l_partkey
         WHERE r_name = 'EUROPE'""",

    "sparql_watdiv_c1" ->
      s"""SELECT $liSubj AS li,
                CAST(l_quantity AS VARCHAR) AS q,
                CAST(o_totalprice AS VARCHAR) AS tp,
                c_name AS cname, n_name AS nname
         FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND n_regionkey = 2""",

    "sparql_watdiv_c2" ->
      """SELECT 'customer/' || CAST(c_custkey AS VARCHAR) AS c,
                c_name AS cname, CAST(c_acctbal AS VARCHAR) AS bal,
                n_name AS nname,
                CASE WHEN o_orderkey IS NULL THEN NULL
                     ELSE 'orders/' || CAST(o_orderkey AS VARCHAR) END AS ordp
         FROM customer
         JOIN nation ON n_nationkey = c_nationkey
         JOIN region ON r_regionkey = n_regionkey
         LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') u
           ON u.o_custkey = c_custkey
         WHERE c_mktsegment = 'AUTOMOBILE' AND r_name = 'AFRICA'
           AND c_acctbal > 0.0""",

    "sparql_watdiv_c3" ->
      s"""SELECT $liSubj AS li, p_brand AS brand, s_name AS sname,
                c_name AS cname, r_name AS rname
         FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN region ON r_regionkey = n_regionkey
         WHERE o_orderstatus = 'F' AND p_type = 'MEDIUM'""")
}
