package graft.reasoner

import graft.reasoner.Reasoner.RoundCheckpointOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.TermLex
import graft.sparql.Ast._

/** Annotated (semiring) Datalog: facts carry a numeric tag combined with
  * ⊗ across a rule's premises and ⊕ across alternative derivations — the
  * Spark rebuild of the reference's `Provenance` trait family
  * (`shared/src/provenance.rs:18-61`) and `TagStore`
  * (`shared/src/tag_store.rs:21-76`). The tag is a column on the facts
  * DataFrame; ⊕-merging duplicate derivations is a groupBy aggregate, so
  * the semiring rides the same shuffle as the dedup it replaces.
  *
  * Two stock instances:
  *  - [[Semiring.minMaxProbability]] — ⊗=min, ⊕=max over probabilities
  *    (`provenance.rs` MinMaxProbability)
  *  - [[Semiring.expiration]] — same algebra over expiry timestamps
  *    (`ExpirationProvenance`; a derived fact lives while its weakest
  *    support lives, `datalog/src/cross_window_sds.rs:16-120`)
  */
final case class Semiring(
    times: Seq[Column] => Column,       // ⊗ across premises
    plusAgg: Column => Column,          // ⊕ as aggregate over derivations
    plusPair: (Column, Column) => Column, // ⊕ of two tags (improvement test)
    /** ⊕ idempotent (a⊕a = a)? Enables the delta-driven semi-naive
      * fixpoint; non-idempotent ⊕ (addmult) must recompute from the seed
      * base every round to count each derivation exactly once. */
    idempotent: Boolean = true,
    /** Safe for the recursive-doubling closure strategy? Requires a
      * closed semiring: ⊕ idempotent/associative/commutative, ⊗
      * associative and distributive over ⊕ — then squaring computes the
      * same per-fact tag as path-at-a-time semi-naive (min-max, boolean).
      * False for the proofs semiring: its top-k truncation makes ⊕/⊗
      * association-order-sensitive, and the reference enumerates proofs
      * in linear derivation order. */
    doublingSafe: Boolean = false,
    /** ⊖ (negation-as-failure contribution of a PRESENT fact) and ⊤ (the
      * ⊗-identity, the contribution of an ABSENT fact) — the reference's
      * `Provenance::negate`/`one` (`provenance.rs:36-37,85,127,169`).
      * None = the semiring has no exact negation (the proofs semiring —
      * the reference's TopK `negate` is likewise approximate,
      * `provenance.rs:256-262`) and NAF degrades to the anti-join. */
    negate: Option[Column => Column] = None,
    one: Column = lit(1.0),
    zero: Column = lit(0.0))

object Semiring {
  val minMaxProbability: Semiring =
    Semiring(cs => least(cs: _*), c => max(c), (a, b) => greatest(a, b),
      doublingSafe = true, negate = Some(c => lit(1.0) - c))
  /** Same (min, max) algebra, but over expiry timestamps — "1 − expiry"
    * is meaningless, so no negation. */
  val expiration: Semiring = minMaxProbability.copy(negate = None)
}

class AnnotatedReasoner(spark: SparkSession, semiring: Semiring,
    enableDoubling: Boolean = true) {

  /** Whether the last [[materialize]] call reached its fixpoint within the
    * round budget, and the rounds it consumed. Callers that cap rounds on
    * purpose (the diagnostic topk mode's deep-recursion guard) read this
    * to surface the truncation instead of silently returning a partial
    * closure. */
  @volatile var lastConverged: Boolean = true
  @volatile var lastRounds: Int = 0

  private def termVars(t: Term): Seq[String] = t match {
    case Var(n) => Seq(n)
    case Quoted(s, p, o) => termVars(s) ++ termVars(p) ++ termVars(o)
    case _ => Nil
  }

  /** Scan carrying the tag as a uniquely-named column. */
  private def scan(facts: DataFrame, tp: TriplePattern, tagAs: String): DataFrame = {
    var filters = List.empty[Column]
    var binds = List.empty[(String, Column)]
    def walk(c: Column, t: Term): Unit = t match {
      case Var(n) => binds ::= (n -> c)
      case other => filters ::= (c === lit(TermLex.lexical(other)))
    }
    walk(col("s"), tp.s); walk(col("p"), tp.p); walk(col("o"), tp.o)
    val grouped = binds.reverse.groupBy(_._1)
    val eqs = grouped.values.flatMap(cs => cs.tail.map(x => x._2 === cs.head._2))
    val filtered = (filters ++ eqs).foldLeft(facts)((d, f) => d.filter(f))
    filtered.select(grouped.map { case (n, cs) => cs.head._2.as(n) }.toSeq :+
      col("tag").as(tagAs): _*)
  }

  private def joinBindings(l: DataFrame, r: DataFrame): DataFrame = {
    val shared = l.columns.filter(c => r.columns.contains(c) && !c.startsWith("__tag"))
    if (shared.isEmpty) l.crossJoin(r) else l.join(r, shared.toSeq, "inner")
  }

  /** One rule application: derived head facts tagged ⊗(premise tags),
    * ⊕-merged per fact. `delta` optionally binds premise position i to the
    * delta relation (provenance semi-naive, `provenance_semi_naive.rs:
    * 38-90` find_premise_solutions over delta triggers). */
  def applyRule(facts: DataFrame, rule: Rule,
      delta: Option[(Int, DataFrame)] = None): DataFrame = {
    val scans = rule.premise.zipWithIndex.map { case (tp, i) =>
      val src = delta match {
        case Some((di, d)) if di == i => d
        case _ => facts
      }
      scan(src, tp, s"__tag$i")
    }
    var b = scans.reduce(joinBindings)
    rule.negativePremise.foreach { ntp =>
      val neg = scan(facts, ntp, "__tagn").drop("__tagn")
      val shared = b.columns.filter(neg.columns.contains(_)).toSeq
      b = if (shared.isEmpty) b.join(broadcast(neg.limit(1)), lit(true), "left_anti")
          else b.join(neg, shared, "left_anti")
    }
    val tagCols = rule.premise.indices.map(i => col(s"__tag$i"))
    val tagged = b.withColumn("tag",
      if (tagCols.size == 1) tagCols.head else semiring.times(tagCols))
    def termCol(t: Term): Column = t match {
      case Var(n) => if (tagged.columns.contains(n)) col(n) else lit(null).cast(StringType)
      case other => lit(TermLex.lexical(other))
    }
    rule.conclusion.map { tp =>
      tagged.select(termCol(tp.s).as("s"), termCol(tp.p).as("p"),
          termCol(tp.o).as("o"), col("tag"))
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
    }.reduce(_ unionByName _)
      .groupBy("s", "p", "o").agg(semiring.plusAgg(col("tag")).as("tag"))
  }

  /** ⊕-merge two tagged fact sets. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("s", "p", "o").agg(semiring.plusAgg(col("tag")).as("tag"))

  /** Annotated fixpoint. Two regimes, matching ⊕'s algebra:
    *
    *  - idempotent ⊕ (min-max / boolean / expiration / proof-set union):
    *    delta-driven semi-naive — each round evaluates rules only with the
    *    improved-fact delta bound to one premise position, exactly the
    *    reference's delta-trigger mechanism
    *    (`provenance_semi_naive.rs:134-200` delta_improved), so the work
    *    per round is proportional to the frontier, not the closure.
    *  - non-idempotent ⊕ (addmult): Jacobi iteration — every round
    *    recomputes each fact's tag FRESH as seeds ⊕ {derivations over the
    *    previous tags}, stopping when tags stabilize; accumulating would
    *    ⊕ the same derivation repeatedly (the reference tolerates that
    *    and epsilon-stops; recomputing counts each derivation once). */
  def materialize(facts0: DataFrame, rules: Seq[Rule], maxRounds: Int = 100): DataFrame =
    if (semiring.idempotent) materializeSemiNaive(facts0, rules, maxRounds)
    else materializeJacobi(facts0, rules, maxRounds)

  /** Stratified negation-aware materialization, the reference's
    * provenance pipeline (`provenance_semi_naive.rs:240-266`): positive
    * rules run to the semi-naive fixpoint (stratum 0), then every rule
    * with negative premises runs in ONE negative pass (stratum 1) whose
    * derivations ⊕-merge into the closure. Requires [[Semiring.negate]]
    * when any rule carries a NOT; semirings without exact negation keep
    * using [[materialize]]'s anti-join approximation. */
  def materializeStratified(facts0: DataFrame, rules: Seq[Rule],
      maxRounds: Int = 100): DataFrame = {
    val (negRules, posRules) = rules.partition(_.negativePremise.nonEmpty)
    val closed =
      if (posRules.nonEmpty) materialize(facts0, posRules, maxRounds)
      else facts0.groupBy("s", "p", "o")
        .agg(semiring.plusAgg(col("tag")).as("tag")).localCheckpoint()
    if (negRules.isEmpty) closed
    else {
      val derived = negRules.map(r => negativePass(closed, r)).reduce(merge)
      // new facts get their pass tag; already-known facts ⊕-merge
      // (`provenance_semi_naive.rs:381` update_disjunction)
      merge(closed, derived)
    }
  }

  /** One rule's negative-stratum pass (`provenance_semi_naive.rs:297-385`):
    * bind the positive premises, then for each negated atom — ground once
    * the binding instantiates it — contribute ⊖(tag) when the fact is
    * present and ⊤ when absent; the conclusion tag is the ⊗ of premise
    * tags and NAF contributions, zero-tag conclusions dropped. */
  private def negativePass(facts: DataFrame, rule: Rule): DataFrame = {
    val negF = semiring.negate.getOrElse(throw new IllegalArgumentException(
      "this semiring has no exact negation (Provenance::negate); " +
        "use materialize()'s anti-join NAF instead"))
    val scans = rule.premise.zipWithIndex.map { case (tp, i) =>
      scan(facts, tp, s"__tag$i")
    }
    var b = scans.reduce(joinBindings)
    val contribs = rule.negativePremise.zipWithIndex.map { case (ntp, j) =>
      val negScan = scan(facts, ntp, s"__ntag$j")
      val shared = negScan.columns.filter(c => c != s"__ntag$j").toSeq
      // safety (`provenance_semi_naive.rs:356-359`): a variable in a
      // negated atom must be bound by the positive premises
      require(shared.forall(b.columns.contains),
        s"unbound variable in negated atom of rule ${rule.name}")
      b =
        if (shared.isEmpty)
          b.join(broadcast(negScan.limit(1)), lit(true), "left_outer")
        else b.join(negScan, shared, "left_outer")
      when(col(s"__ntag$j").isNotNull, negF(col(s"__ntag$j")))
        .otherwise(semiring.one)
    }
    val tagCols = rule.premise.indices.map(i => col(s"__tag$i")) ++ contribs
    val tagged = b.withColumn("tag",
        if (tagCols.size == 1) tagCols.head else semiring.times(tagCols))
      .filter(col("tag") =!= semiring.zero)
    def termCol(t: Term): Column = t match {
      case Var(n) => if (tagged.columns.contains(n)) col(n) else lit(null).cast(StringType)
      case other => lit(TermLex.lexical(other))
    }
    rule.conclusion.map { tp =>
      tagged.select(termCol(tp.s).as("s"), termCol(tp.p).as("p"),
          termCol(tp.o).as("o"), col("tag"))
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
    }.reduce(_ unionByName _)
      .groupBy("s", "p", "o").agg(semiring.plusAgg(col("tag")).as("tag"))
  }

  /** See [[Reasoner.broadcastDeltaMaxRows]] — localCheckpoint erases the
    * stats Catalyst needs to broadcast a small frontier on its own. */
  private val broadcastDeltaMaxRows = 1000000L

  private def materializeSemiNaive(facts0: DataFrame, rules: Seq[Rule],
      maxRounds: Int): DataFrame = {
    val debug = sys.env.contains("GRAFT_REASONER_DEBUG")
    var facts = facts0.groupBy("s", "p", "o")
      .agg(semiring.plusAgg(col("tag")).as("tag")).localCheckpointSevered()

    // Strategy choice, mirroring [[Reasoner.materializeSemiNaive]]: a
    // transitive-closure rule shape over a closed semiring is evaluated by
    // matrix-style squaring — the classic closed-semiring path problem —
    // in O(log depth) driver rounds instead of one round per level.
    if (enableDoubling && semiring.doublingSafe)
      Reasoner.transitiveShape(rules).foreach { sh =>
        if (facts.filter(col("p") === sh.head).isEmpty) {
          if (debug) println(s"[annotated] strategy=semiring-doubling(edge=${sh.edge}, head=${sh.head})")
          val closure = closureByDoubling(
            facts.filter(col("p") === sh.edge).select("s", "o", "tag"),
            maxRounds, debug)
          return facts.unionByName(
            closure.select(col("s"), lit(sh.head).as("p"), col("o"), col("tag")))
        }
      }

    // Dead delta positions (as in the plain reasoner): when every rule head
    // has a constant predicate, a delta fact after round 0 can only carry a
    // head predicate, so premise positions with a constant non-head
    // predicate never match the delta.
    def constPred(t: Term): Option[String] = t match {
      case Iri(v) => Some(v); case Lit(v) => Some(v); case _ => None
    }
    val headPreds: Option[Set[String]] = {
      val ps = rules.flatMap(_.conclusion).map(tp => constPred(tp.p))
      if (ps.forall(_.isDefined)) Some(ps.flatten.toSet) else None
    }
    def deltaCanMatch(tp: TriplePattern): Boolean = (headPreds, constPred(tp.p)) match {
      case (Some(hp), Some(p)) => hp.contains(p)
      case _ => true
    }

    var delta = facts
    var deltaRows = -1L // unknown on round 0 (delta = all seeds)
    var round = 0
    var fastPathDepth = 0
    val fastPathCheckpointEvery = 8
    lastConverged = true
    while (round < maxRounds) {
      lastRounds = round
      val tRound = System.nanoTime()
      val smallDelta = deltaRows >= 0 && deltaRows <= broadcastDeltaMaxRows
      val perPosition = rules.flatMap { r =>
        val deltaSide = if (smallDelta && r.premise.size > 1) broadcast(delta) else delta
        r.premise.indices
          .filter(i => round == 0 || deltaCanMatch(r.premise(i)))
          .map(i => applyRule(facts, r, Some((i, deltaSide))))
      }
      if (perPosition.isEmpty) return facts
      val derived = perPosition.reduce(merge)
      // improvement join (the D_new criterion): keep facts that are new or
      // whose ⊕-merged tag differs from the stored one
      val improved = derived.select(col("s"), col("p"), col("o"), col("tag").as("__dtag"))
        .join(facts.select(col("s"), col("p"), col("o"), col("tag").as("__ftag")),
          Seq("s", "p", "o"), "left_outer")
        .withColumn("tag", when(col("__ftag").isNull, col("__dtag"))
          .otherwise(semiring.plusPair(col("__dtag"), col("__ftag"))))
        .filter(col("__ftag").isNull || col("tag") =!= col("__ftag"))
        .withColumn("__retag", col("__ftag").isNotNull)
        .select("s", "p", "o", "tag", "__retag")
      // r12: checkpoint + BOTH convergence counts (frontier size and
      // retagged rows) fold into the materialization job — this loop used
      // to pay three actions per round (checkpoint, count, the __retag
      // isEmpty probe) for one round's worth of data. Same rows, same
      // counts, one action.
      val (improvedCk, (dn, retagged)) =
        org.apache.spark.sql.graft.CheckpointBridge.localCheckpointSeveredAgg[(Long, Long)](
          improved, (0L, 0L),
          { case ((all, rt), row) =>
              (all + 1L, if (row.getBoolean(4)) rt + 1L else rt) },
          { case ((a1, r1), (a2, r2)) => (a1 + a2, r1 + r2) })
      deltaRows = dn
      if (debug) println(f"[annotated] round $round: delta=$deltaRows, ${(System.nanoTime() - tRound) / 1e9}%.2f s")
      if (deltaRows == 0) return facts
      delta = improvedCk.select("s", "p", "o", "tag")
      // insert-only fast path: when no existing fact was re-tagged (the
      // common case for set-like closures — each fact's tag is fixed by
      // its first derivation), the accumulated facts are untouched and the
      // union needs no anti-join and no O(|closure|) re-checkpoint. The
      // lazy union of checkpointed deltas still deepens the plan each
      // round (and lazy unions of checkpointed frames can trip Catalyst's
      // Union constraint rewrite on self-joins — see closureByDoubling),
      // so re-materialize the accumulated union every few rounds to keep
      // plan size bounded.
      if (retagged == 0L) {
        facts = facts.unionByName(delta)
        fastPathDepth += 1
        if (fastPathDepth >= fastPathCheckpointEvery) {
          facts = facts.localCheckpointSevered()
          fastPathDepth = 0
        }
      } else {
        facts = facts.join(delta, Seq("s", "p", "o"), "left_anti")
          .unionByName(delta).localCheckpointSevered()
        fastPathDepth = 0
      }
      round += 1
      Reasoner.maybeReclaimShuffles(round)
    }
    lastConverged = false
    facts
  }

  /** Semiring transitive closure by squaring: T_{k+1}(a,c) =
    * T_k(a,c) ⊕ ⊕_b T_k(a,b) ⊗ T_k(b,c) — each round one self-join plus
    * one ⊕-groupBy over the closure so far, converged when no pair is new
    * and no tag changed. Valid for closed semirings ([[Semiring.doublingSafe]]). */
  private def closureByDoubling(edges: DataFrame, maxRounds: Int,
      debug: Boolean): DataFrame = {
    var t = edges.groupBy("s", "o")
      .agg(semiring.plusAgg(col("tag")).as("tag")).localCheckpointSevered()
    var round = 0
    lastConverged = false
    while (round < math.min(maxRounds, 64)) {
      lastRounds = round
      val tRound = System.nanoTime()
      val hop = t.as("l").join(t.as("r"), col("l.o") === col("r.s"))
        .select(col("l.s").as("s"), col("r.o").as("o"),
          semiring.times(Seq(col("l.tag"), col("r.tag"))).as("tag"))
      // change detection fused into the squaring job: ⊕-aggregate the hop
      // pairs alone, full-outer-merge with the previous closure, and flag
      // new-or-improved rows — valid because doublingSafe ⊕ is
      // associative/commutative, so ⊕(T ∪ hops) = ⊕(⊕hops, T). The
      // convergence count is then a filter over the checkpointed frame,
      // not a second O(|closure|) join action per round.
      val hopAgg = hop.groupBy("s", "o").agg(semiring.plusAgg(col("tag")).as("__htag"))
      val next = t.select(col("s"), col("o"), col("tag").as("__old"))
        .join(hopAgg, Seq("s", "o"), "full_outer")
        .withColumn("tag",
          when(col("__old").isNull, col("__htag"))
            .when(col("__htag").isNull, col("__old"))
            .otherwise(semiring.plusPair(col("__htag"), col("__old"))))
        .withColumn("__chg", col("__old").isNull || col("tag") =!= col("__old"))
        .select("s", "o", "tag", "__chg")
      // r12: checkpoint + the __chg convergence count fused into the one
      // materialization job (was: checkpoint action, then a filtered
      // count action over the same blocks)
      val (nextCk, changed) =
        org.apache.spark.sql.graft.CheckpointBridge.localCheckpointSeveredAgg[Long](
          next, 0L,
          (c, row) => if (row.getBoolean(3)) c + 1L else c, _ + _)
      if (debug) println(f"[annotated] doubling round $round: changed=$changed, ${(System.nanoTime() - tRound) / 1e9}%.2f s")
      // the previous round's checkpoint blocks are dead once `next` is
      // materialized; dropping them eagerly (instead of waiting for the
      // weak-ref ContextCleaner, which rarely fires on a mostly-idle
      // large heap) is what keeps rep-to-rep spread down — each rep
      // otherwise accumulates every round of every prior rep on-heap
      Reasoner.unpersistCheckpoint(t)
      t = nextCk.select("s", "o", "tag")
      if (changed == 0) { lastConverged = true; return t }
      round += 1
      Reasoner.maybeReclaimShuffles(round)
    }
    t
  }

  private def materializeJacobi(facts0: DataFrame, rules: Seq[Rule],
      maxRounds: Int): DataFrame = {
    val base = facts0.groupBy("s", "p", "o")
      .agg(semiring.plusAgg(col("tag")).as("tag")).localCheckpointSevered()
    var facts = base
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      lastRounds = round
      val derived = rules.map(r => applyRule(facts, r)).reduce(merge)
      val next = merge(base, derived).localCheckpointSevered()
      // stability check: a monotone semiring's tags only grow, so the
      // iteration has converged when no fact is new or re-tagged
      val improved = next.as("n").join(facts.as("f"),
          Seq("s", "p", "o"), "left_outer")
        .filter(col("f.tag").isNull || col("n.tag") =!= col("f.tag"))
      changed = !improved.isEmpty
      facts = next
      round += 1
    }
    lastConverged = !changed
    facts
  }
}

/** Cross-window reasoning with expiry (`datalog/src/cross_window_sds.rs`,
  * `cross_window_incremental.rs`): window contents become facts whose tag
  * is an expiry time (event_time + α); derived facts live while their
  * weakest support lives; facts past expiry are dropped before querying.
  *
  * `Naive` rebuilds the materialization from all live window contents on
  * every step; `Incremental` keeps the previous materialization and feeds
  * only improved facts through the rules — the reference differentially
  * tests these two against each other (`datalog/tests/cross_window_tests.rs`),
  * as does CrossWindowSpec here.
  */
class CrossWindowReasoner(
    spark: SparkSession,
    rules: Seq[Rule],
    alphaMs: Long,
    staticFacts: Option[DataFrame] = None,
    incremental: Boolean = true) {

  private val reasoner = new AnnotatedReasoner(spark, Semiring.expiration)
  private val contents = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private var state: Option[DataFrame] = None

  private def tagStatic(df: DataFrame): DataFrame =
    df.select(col("s"), col("p"), col("o"), lit(Double.MaxValue).as("tag"))

  /** Feed one window firing's content `(s, p, o, event_time)`; returns the
    * live materialized facts as of `nowMs`. */
  def onWindow(content: DataFrame, nowMs: Long): DataFrame =
    onTagged(content.select(col("s"), col("p"), col("o"),
      (col("event_time") + lit(alphaMs.toDouble)).cast("double").as("tag")), nowMs)

  /** Same step with the expiry tags ALREADY computed — the entry point
    * for callers whose facts carry per-source α (the RSP engine's
    * cross-window mode tags each window's content with its own width). */
  def onTagged(tagged: DataFrame, nowMs: Long): DataFrame = {
    val live: DataFrame =
      if (!incremental) {
        contents += tagged.localCheckpointSevered()
        val base = (contents.toSeq ++ staticFacts.map(tagStatic)).reduce(_ unionByName _)
        reasoner.materialize(base.filter(col("tag") > nowMs), rules)
      } else {
        val base = state match {
          case None => staticFacts.map(tagStatic).map(_.unionByName(tagged)).getOrElse(tagged)
          case Some(st) => reasoner.merge(st, tagged)
        }
        reasoner.materialize(base.filter(col("tag") > nowMs), rules)
      }
    val checkpointed = live.localCheckpointSevered()
    state = Some(checkpointed)
    checkpointed
  }
}
