package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.prob.ProbReasoner
import graft.reasoner.Semiring
import graft.sparql.SparqlParser

/** Probabilistic-inference correctness queries (SURVEY §2.10 SDD/hybrid
  * slice, round 2): min-max semiring closure, top-k proof lineage, and the
  * hybrid certified-interval evaluator, each with a DuckDB oracle.
  *
  * Seeds: the halving-chain edges (`ReasonerSuite.chainStore` shape) with
  * a deterministic per-edge probability `0.5 + (c_custkey % 50)/100` that
  * both engines compute from the same integers — min/max propagate exact
  * doubles; products are rounded on both sides.
  */
object ProbSuite {

  /** Halving-chain edges with a deterministic per-edge probability.
    * `probOf` must mirror the DuckDB-side expression exactly. For the
    * product-based entries the grid is BINARY fractions (n/4, n/32): every
    * factor has a tiny mantissa, so chain products of any depth stay
    * bitwise-exact in double — identical in both engines regardless of
    * multiplication order, with no rounding step to straddle. */
  private def seedEdges(s: SparkSession, dir: String,
      probOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val c = s.read.parquet(s"$dir/customer.parquet")
    c.filter(col("c_custkey") >= 1).select(
      concat(lit("customer/"), col("c_custkey")).as("s"),
      lit("chain/parent").as("p"),
      concat(lit("customer/"), (col("c_custkey") / 2).cast("long")).as("o"),
      probOf(col("c_custkey")).as("prob"))
  }

  private def gridProb(k: org.apache.spark.sql.Column) =
    lit(0.5) + (k % 50).cast("double") / 100.0
  private def binProb2(k: org.apache.spark.sql.Column) =
    lit(0.5) + (k % 2).cast("double") / 4.0
  private def binProb8(k: org.apache.spark.sql.Column) =
    lit(0.5) + (k % 8).cast("double") / 32.0

  private val closureRules = Seq(
    SparqlParser().parseRule(
      """RULE <rules/panc_base> PROB(provenance=minmax) :-
         CONSTRUCT { ?x <chain/anc> ?y } WHERE { ?x <chain/parent> ?y }"""),
    SparqlParser().parseRule(
      """RULE <rules/panc_step> PROB(provenance=minmax) :-
         CONSTRUCT { ?x <chain/anc> ?z }
         WHERE { ?x <chain/parent> ?y . ?y <chain/anc> ?z }"""))

  private val twoHopRule = SparqlParser().parseRule(
    """RULE <rules/anc2> PROB(provenance=hybrid, threshold=0.5) :-
       CONSTRUCT { ?x <chain/anc2> ?z }
       WHERE { ?x <chain/parent> ?y . ?y <chain/parent> ?z }""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // min-max probability semiring over the recursive closure: a derived
    // fact's probability = min of its premise tags, max across derivations
    // (unique path on the chain, so LEAST along the path)
    "prob_minmax_closure" -> ((s, dir) => {
      ProbReasoner.scalarMaterialize(s, seedEdges(s, dir, gridProb), closureRules,
          Semiring.minMaxProbability)
        .filter(col("p") === "chain/anc")
        .select(col("s").as("x"), col("o").as("y"),
          col("probability").cast("string").as("pr"))
    }),

    // diagnostic top-k proof lineage (`parser.rs:3888-3927`): on the chain
    // each fact has exactly one proof, so the WMC estimate is the product
    // of the edge probabilities along the path; reported in parts-per-
    // million (exact: the ×1e6 keeps small deep-chain products in the
    // plain-decimal formatting range of both engines)
    "prob_topk" -> ((s, dir) => {
      ProbReasoner.topkMaterialize(s, seedEdges(s, dir, binProb2), closureRules, k = 5)
        .filter(col("p") === "chain/anc")
        .select(col("s").as("x"), col("o").as("y"),
          (col("estimate") * 1000000.0).cast("string").as("est_ppm"),
          col("status"), col("reason"))
    }),

    // negation-aware provenance (provenance_semi_naive.rs negative pass):
    // nourgent(c) fires for every member; its tag ⊗-combines the member
    // probability with ⊖(max urgent-order tag) when hasurgent(c) was
    // derived in stratum 0, and ⊤ when it wasn't — min/max/1−p are exact
    // doubles, so the oracle's closed form LEAST(pm, 1−mp) hash-matches
    "prob_negation_minmax" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("long").as("k"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").cast("long").as("ok"),
          col("o_custkey").cast("long").as("ck"))
      val member = c.select(
        concat(lit("customer/"), col("k")).as("s"),
        lit("is/member").as("p"), lit("true").as("o"),
        (lit(0.5) + (col("k") % 4).cast("double") / 16.0).as("prob"))
      val urgent = o.select(
        concat(lit("order/"), col("ok")).as("s"),
        lit("urgent/for").as("p"),
        concat(lit("customer/"), col("ck")).as("o"),
        (lit(0.5) + (col("ok") % 8).cast("double") / 32.0).as("prob"))
      val rules = Seq(
        SparqlParser().parseRule(
          """RULE <rules/hasurgent> PROB(provenance=minmax) :-
             CONSTRUCT { ?c <flag/hasurgent> "true" }
             WHERE { ?o <urgent/for> ?c }"""),
        SparqlParser().parseRule(
          """RULE <rules/nourgent> PROB(provenance=minmax) :-
             CONSTRUCT { ?c <flag/nourgent> "true" }
             WHERE { ?c <is/member> "true" .
                     NOT { ?c <flag/hasurgent> "true" } }"""))
      ProbReasoner.scalarMaterialize(s, member.unionByName(urgent), rules,
          graft.reasoner.Semiring.minMaxProbability)
        .filter(col("p") === "flag/nourgent")
        .select(col("s").as("cust"), col("probability").cast("string").as("pr"))
    }),

    // negation-aware LINEAGE (signed literals): safe(c) ← member(c),
    // NOT risky(c) with risky(c) ← member(c) ∧ signal(c). The signed
    // formula m ⊗ ⊖(m∧s) prunes to m∧¬s, so the exact value is
    // pm·(1−ps) — the correlation-aware answer only signed WMC gets
    // right (a scalar noisy-or would compute pm·(1−pm·ps))
    "prob_wmc_negation" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("long").as("k"))
      val member = c.select(
        concat(lit("customer/"), col("k")).as("s"),
        lit("is/member").as("p"), lit("true").as("o"),
        (lit(0.5) + (col("k") % 4).cast("double") / 16.0).as("prob"))
      val signal = c.filter(col("k") % 2 === 0).select(
        concat(lit("customer/"), col("k")).as("s"),
        lit("has/signal").as("p"), lit("true").as("o"),
        (lit(0.5) + (col("k") % 8).cast("double") / 32.0).as("prob"))
      val rules = Seq(
        SparqlParser().parseRule(
          """RULE <rules/risky> PROB(provenance=wmc) :-
             CONSTRUCT { ?c <flag/risky> "true" }
             WHERE { ?c <is/member> "true" . ?c <has/signal> "true" }"""),
        SparqlParser().parseRule(
          """RULE <rules/safe> PROB(provenance=wmc) :-
             CONSTRUCT { ?c <flag/safe> "true" }
             WHERE { ?c <is/member> "true" .
                     NOT { ?c <flag/risky> "true" } }"""))
      ProbReasoner.wmcMaterialize(s, member.unionByName(signal), rules)
        .filter(col("p") === "flag/safe")
        .select(col("s").as("cust"), col("value").cast("string").as("value"),
          col("status"), col("proof_count"))
    }),

    // SDD-backed exact WMC on a two-proof diamond: every customer k with
    // 2k in key range derives <k p/loop k> through ea(k,2k)∘eb(2k,k) and
    // (when 2k+1 is in range) ea(k,2k+1)∘eb(2k+1,k) — two proofs over
    // four DISTINCT seeds, so the SDD's model count has the closed form
    // 1 − (1−p₁q₁)(1−p₂q₂) that DuckDB reproduces bit-for-bit on the
    // binary-fraction grid (all weights dyadic with ≤6 mantissa bits)
    "prob_sdd_wmc" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("long").as("k"))
      val maxk = c.agg(max("k")).first().getLong(0)
      def cust(k: org.apache.spark.sql.Column) = concat(lit("customer/"), k)
      // k ≥ 1 keeps every proof's eb source (2k, 2k+1) inside eb's k ≥ 2
      // domain; key 0 would need eb edges the seed set doesn't contain
      val ea1 = c.filter(col("k") >= 1 && col("k") * 2 <= maxk).select(
        cust(col("k")).as("s"), lit("e/a").as("p"), cust(col("k") * 2).as("o"),
        (lit(0.5) + (col("k") % 8).cast("double") / 32.0).as("prob"))
      val ea2 = c.filter(col("k") >= 1 && col("k") * 2 + 1 <= maxk).select(
        cust(col("k")).as("s"), lit("e/a").as("p"), cust(col("k") * 2 + 1).as("o"),
        (lit(0.25) + (col("k") % 4).cast("double") / 16.0).as("prob"))
      val eb = c.filter(col("k") >= 2).select(
        cust(col("k")).as("s"), lit("e/b").as("p"),
        cust(floor(col("k") / 2).cast("long")).as("o"),
        (lit(0.5) + (col("k") % 16).cast("double") / 64.0).as("prob"))
      val rule = SparqlParser().parseRule(
        """RULE <rules/roundtrip> PROB(provenance=sdd) :-
           CONSTRUCT { ?x <p/loop> ?x } WHERE { ?x <e/a> ?y . ?y <e/b> ?x }""")
      ProbReasoner.sddMaterialize(s, ea1.unionByName(ea2).unionByName(eb), Seq(rule))
        .select(col("s").as("x"), col("value").cast("string").as("value"),
          col("status"), col("reason"), col("proof_count"))
    }),

    // hybrid certified evaluation on a non-recursive two-hop rule: single
    // proof per fact → Exact, value = product, Alert iff ≥ threshold
    "prob_hybrid_twohop" -> ((s, dir) => {
      ProbReasoner.hybridMaterialize(s, seedEdges(s, dir, binProb8), twoHopRule,
          twoHopRule.prob.get)
        .select(col("s").as("x"), col("o").as("z"),
          col("value").cast("string").as("value"),
          col("status"), col("decision"), col("reason"))
    }))

  private val gridProbSql = "0.5 + (%s %% 50) / 100.0"
  private val binProb2Sql = "0.5 + (%s %% 2) / 4.0"
  private val binProb8Sql = "0.5 + (%s %% 8) / 32.0"

  val oracleSql: Map[String, String] = Map(
    "prob_minmax_closure" ->
      s"""WITH RECURSIVE anc(x, y, pr) AS (
           SELECT c_custkey, CAST(floor(c_custkey / 2) AS BIGINT),
                  ${gridProbSql.format("c_custkey")}
           FROM customer WHERE c_custkey >= 1
           UNION
           SELECT e.c_custkey, a.y,
                  LEAST(${gridProbSql.format("e.c_custkey")}, a.pr)
           FROM customer e JOIN anc a ON a.x = CAST(floor(e.c_custkey / 2) AS BIGINT)
           WHERE e.c_custkey >= 1)
         SELECT 'customer/' || CAST(x AS VARCHAR) AS x,
                'customer/' || CAST(y AS VARCHAR) AS y,
                CAST(pr AS VARCHAR) AS pr FROM anc""",

    "prob_topk" ->
      s"""WITH RECURSIVE anc(x, y, pr) AS (
           SELECT c_custkey, CAST(floor(c_custkey / 2) AS BIGINT),
                  ${binProb2Sql.format("c_custkey")}
           FROM customer WHERE c_custkey >= 1
           UNION
           SELECT e.c_custkey, a.y,
                  (${binProb2Sql.format("e.c_custkey")}) * a.pr
           FROM customer e JOIN anc a ON a.x = CAST(floor(e.c_custkey / 2) AS BIGINT)
           WHERE e.c_custkey >= 1)
         SELECT 'customer/' || CAST(x AS VARCHAR) AS x,
                'customer/' || CAST(y AS VARCHAR) AS y,
                CAST(pr * 1000000.0 AS VARCHAR) AS est_ppm,
                'UnsafeApproximation' AS status,
                'diagnostic-only' AS reason FROM anc""",

    "prob_negation_minmax" ->
      """WITH up AS (SELECT o_custkey AS ck,
                MAX(0.5 + (o_orderkey % 8) / 32.0) AS mp
              FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
         SELECT 'customer/' || CAST(c.c_custkey AS VARCHAR) AS cust,
           CAST(CASE WHEN up.mp IS NULL THEN 0.5 + (c.c_custkey % 4) / 16.0
                ELSE LEAST(0.5 + (c.c_custkey % 4) / 16.0, 1.0 - up.mp) END
             AS VARCHAR) AS pr
         FROM customer c LEFT JOIN up ON up.ck = c.c_custkey""",

    "prob_wmc_negation" ->
      """SELECT 'customer/' || CAST(c_custkey AS VARCHAR) AS cust,
           CAST(CASE WHEN c_custkey % 2 = 0
             THEN (0.5 + (c_custkey % 4) / 16.0) *
                  (1.0 - (0.5 + (c_custkey % 8) / 32.0))
             ELSE 0.5 + (c_custkey % 4) / 16.0 END AS VARCHAR) AS value,
           'Exact' AS status, CAST(1 AS INTEGER) AS proof_count
         FROM customer""",

    "prob_sdd_wmc" ->
      """WITH mx AS (SELECT max(c_custkey) AS m FROM customer)
         SELECT 'customer/' || CAST(c.c_custkey AS VARCHAR) AS x,
           CAST(1.0 - (1.0 - CASE WHEN 2*c.c_custkey <= mx.m
                 THEN (0.5 + (c.c_custkey % 8)/32.0) *
                      (0.5 + ((2*c.c_custkey) % 16)/64.0) ELSE 0.0 END)
              * (1.0 - CASE WHEN 2*c.c_custkey + 1 <= mx.m
                 THEN (0.25 + (c.c_custkey % 4)/16.0) *
                      (0.5 + ((2*c.c_custkey + 1) % 16)/64.0) ELSE 0.0 END)
            AS VARCHAR) AS value,
           'Exact' AS status, 'sdd-wmc' AS reason,
           CAST(CASE WHEN 2*c.c_custkey + 1 <= mx.m THEN 2 ELSE 1 END AS INTEGER)
             AS proof_count
         FROM customer c, mx WHERE c.c_custkey >= 1 AND 2*c.c_custkey <= mx.m""",

    "prob_hybrid_twohop" ->
      s"""SELECT 'customer/' || CAST(a.c_custkey AS VARCHAR) AS x,
                'customer/' || CAST(CAST(floor(b.c_custkey / 2) AS BIGINT) AS VARCHAR) AS z,
                CAST((${binProb8Sql.format("a.c_custkey")}) *
                     (${binProb8Sql.format("b.c_custkey")}) AS VARCHAR) AS value,
                'Exact' AS status,
                CASE WHEN (${binProb8Sql.format("a.c_custkey")}) *
                          (${binProb8Sql.format("b.c_custkey")}) >= 0.5
                     THEN 'Alert' ELSE 'NoAlert' END AS decision,
                'top-k-exhausted' AS reason
         FROM customer a JOIN customer b
           ON b.c_custkey = CAST(floor(a.c_custkey / 2) AS BIGINT)
         WHERE a.c_custkey >= 1 AND b.c_custkey >= 1""")
}
