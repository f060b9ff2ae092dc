package graft.reasoner

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
    idempotent: Boolean = true)

object Semiring {
  val minMaxProbability: Semiring =
    Semiring(cs => least(cs: _*), c => max(c), (a, b) => greatest(a, b))
  val expiration: Semiring = minMaxProbability // same (min, max) algebra
}

class AnnotatedReasoner(spark: SparkSession, semiring: Semiring) {

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

  /** See [[Reasoner.broadcastDeltaMaxRows]] — localCheckpoint erases the
    * stats Catalyst needs to broadcast a small frontier on its own. */
  private val broadcastDeltaMaxRows = 1000000L

  private def materializeSemiNaive(facts0: DataFrame, rules: Seq[Rule],
      maxRounds: Int): DataFrame = {
    var facts = facts0.groupBy("s", "p", "o")
      .agg(semiring.plusAgg(col("tag")).as("tag")).localCheckpoint()
    var delta = facts
    var deltaRows = -1L // unknown on round 0 (delta = all seeds)
    var round = 0
    while (round < maxRounds) {
      val smallDelta = deltaRows >= 0 && deltaRows <= broadcastDeltaMaxRows
      val derived = rules.flatMap { r =>
        val deltaSide = if (smallDelta && r.premise.size > 1) broadcast(delta) else delta
        r.premise.indices.map(i => applyRule(facts, r, Some((i, deltaSide))))
      }.reduce(merge)
      // improvement join (the D_new criterion): keep facts that are new or
      // whose ⊕-merged tag differs from the stored one
      val improved = derived.select(col("s"), col("p"), col("o"), col("tag").as("__dtag"))
        .join(facts.select(col("s"), col("p"), col("o"), col("tag").as("__ftag")),
          Seq("s", "p", "o"), "left_outer")
        .withColumn("tag", when(col("__ftag").isNull, col("__dtag"))
          .otherwise(semiring.plusPair(col("__dtag"), col("__ftag"))))
        .filter(col("__ftag").isNull || col("tag") =!= col("__ftag"))
        .select("s", "p", "o", "tag")
        .localCheckpoint()
      deltaRows = improved.count()
      if (deltaRows == 0) return facts
      // replace-merge: drop superseded rows, add the improved ones
      facts = facts.join(improved, Seq("s", "p", "o"), "left_anti")
        .unionByName(improved).localCheckpoint()
      delta = improved
      round += 1
    }
    facts
  }

  private def materializeJacobi(facts0: DataFrame, rules: Seq[Rule],
      maxRounds: Int): DataFrame = {
    val base = facts0.groupBy("s", "p", "o")
      .agg(semiring.plusAgg(col("tag")).as("tag")).localCheckpoint()
    var facts = base
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val derived = rules.map(r => applyRule(facts, r)).reduce(merge)
      val next = merge(base, derived).localCheckpoint()
      // stability check: a monotone semiring's tags only grow, so the
      // iteration has converged when no fact is new or re-tagged
      val improved = next.as("n").join(facts.as("f"),
          Seq("s", "p", "o"), "left_outer")
        .filter(col("f.tag").isNull || col("n.tag") =!= col("f.tag"))
      changed = !improved.isEmpty
      facts = next
      round += 1
    }
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
  def onWindow(content: DataFrame, nowMs: Long): DataFrame = {
    val tagged = content.select(col("s"), col("p"), col("o"),
      (col("event_time") + lit(alphaMs.toDouble)).cast("double").as("tag"))
    val live: DataFrame =
      if (!incremental) {
        contents += tagged.localCheckpoint()
        val base = (contents.toSeq ++ staticFacts.map(tagStatic)).reduce(_ unionByName _)
        reasoner.materialize(base.filter(col("tag") > nowMs), rules)
      } else {
        val base = state match {
          case None => staticFacts.map(tagStatic).map(_.unionByName(tagged)).getOrElse(tagged)
          case Some(st) => reasoner.merge(st, tagged)
        }
        reasoner.materialize(base.filter(col("tag") > nowMs), rules)
      }
    val checkpointed = live.localCheckpoint()
    state = Some(checkpointed)
    checkpointed
  }
}
