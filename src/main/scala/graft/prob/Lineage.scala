package graft.prob

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Top-k proof lineage as DataFrame columns — the Spark re-expression of
  * the reference's `TopKProofs` provenance (`shared/src/provenance.rs:191-320`)
  * and the lineage cones `evaluate_topk` enumerates
  * (`shared/src/hybrid.rs:1160-1240`).
  *
  * A tag is `struct(proofs, trunc)`:
  *   - `proofs`: `array<array<struct<sid:bigint, sp:double, grp:bigint,
  *     neg:boolean>>>` — up to `retain` proofs ranked by descending
  *     probability; each proof is the canonical (sid-sorted, deduped) set
  *     of contributing SIGNED seed literals (`provenance.rs:322`
  *     WmcLiteral) with the seed probability carried inline, so proof
  *     probability is computable without a seed-table join. `neg = true`
  *     marks a negation-as-failure literal contributing weight 1−sp.
  *   - `trunc`: true iff any ⊕/⊗/⊖ along the derivation dropped proofs —
  *     when false the retained set is the COMPLETE proof formula and
  *     WMC over it is exact (the reference's `ResidualMass::Exhausted`)
  *
  * ⊕/⊗ are Catalyst higher-order functions (`transform`, `aggregate`,
  * `array_sort` with comparator) — per-row, narrow, no shuffle beyond the
  * ⊕ groupBy the reasoner already does. ⊖ (De Morgan complement,
  * `provenance.rs:416+`) is real recursion and runs as a row-level UDF.
  * This is what makes lineage viable at 100 TB: the reference's
  * `Mutex<LineageStore>` DAG is driver-global state; here every fact row
  * carries its own cone.
  */
object Lineage {

  val litType = "struct<sid:bigint,sp:double,grp:bigint,neg:boolean>"
  val tagType = s"struct<proofs:array<array<$litType>>,trunc:boolean>"

  /** ∏ literal weights of one proof: sp for positive, 1−sp for negated. */
  def proofProb(p: Column): Column =
    aggregate(p, lit(1.0), (acc, x) =>
      acc * when(x.getField("neg"), lit(1.0) - x.getField("sp"))
        .otherwise(x.getField("sp")))

  /** Rank proofs by descending probability (ties: lexical on the proof's
    * canonical form, for determinism) and keep the first `retain`. */
  private def rankKeep(proofs: Column, retain: Int): Column = {
    val sorted = array_sort(proofs, (l, r) => {
      val (pl, pr) = (proofProb(l), proofProb(r))
      when(pl > pr, -1).when(pl < pr, 1)
        .otherwise(when(l.cast("string") < r.cast("string"), -1)
          .when(l.cast("string") > r.cast("string"), 1).otherwise(0))
    })
    slice(sorted, 1, retain)
  }

  private def mkTag(proofs: Column, trunc: Column): Column =
    struct(proofs.as("proofs"), trunc.as("trunc"))

  /** ⊥ — no proofs (false). */
  def zero: Column =
    mkTag(array().cast(s"array<array<$litType>>"), lit(false))

  /** ⊤ — one empty proof (true; the ⊗-identity, `provenance.rs:401`). */
  def one: Column =
    mkTag(array(array().cast(s"array<$litType>")), lit(false))

  /** Seed tag: one proof containing the single positive seed literal
    * (sid, sp, grp); grp = -1 marks an independent seed, a non-negative
    * grp groups mutually exclusive alternatives (`hybrid.rs:62-66`). */
  def seedTag(sid: Column, sp: Column, grp: Column = lit(-1L)): Column =
    mkTag(array(array(struct(sid.cast("bigint").as("sid"),
      sp.cast("double").as("sp"), grp.cast("bigint").as("grp"),
      lit(false).as("neg")))), lit(false))

  /** A clause with x ∧ ¬x is unsatisfiable (`provenance.rs:363-368`). */
  private def contradictory(p: Column): Column =
    exists(p, l1 => exists(p, l2 =>
      l2.getField("sid") === l1.getField("sid") &&
        l2.getField("neg") =!= l1.getField("neg")))

  /** ⊕ — union of the two proof sets, ranked, truncated (`provenance.rs:226-238`). */
  def disj(a: Column, b: Column, retain: Int): Column = {
    val merged = array_distinct(concat(a.getField("proofs"), b.getField("proofs")))
    mkTag(rankKeep(merged, retain),
      a.getField("trunc") || b.getField("trunc") || (size(merged) > retain))
  }

  /** ⊗ — cartesian product with signed-literal merge (`provenance.rs:240-257`):
    * each pair of proofs unions its literals (canonical: sorted, deduped),
    * contradictory results dropped. */
  def conj(a: Column, b: Column, retain: Int): Column = {
    val cart = flatten(transform(a.getField("proofs"),
      pa => transform(b.getField("proofs"),
        pb => array_sort(array_distinct(concat(pa, pb))))))
    val merged = filter(array_distinct(cart), p => !contradictory(p))
    mkTag(rankKeep(merged, retain),
      a.getField("trunc") || b.getField("trunc") || (size(merged) > retain))
  }

  final case class PLit(sid: Long, sp: Double, grp: Long, neg: Boolean)
  final case class PTag(proofs: Seq[Seq[PLit]], trunc: Boolean)

  private def part(tag: Column, field: String): Column =
    transform(tag.getField("proofs"), p => transform(p, x => x.getField(field)))

  /** ⊖ — exact De Morgan complement of the proof formula
    * (`provenance.rs:416+` DnfWmcProvenance::negate), as a row-level UDF
    * over the tag's parallel literal arrays: product-of-sums expanded
    * back to a signed DNF with contradiction and subsumption pruning,
    * then ranked and truncated like ⊕/⊗. */
  def negTag(retain: Int): Column => Column = {
    val f = udf((sids: Seq[Seq[Long]], sps: Seq[Seq[Double]],
        grps: Seq[Seq[Long]], negs: Seq[Seq[Boolean]], trunc: Boolean) => {
      val bySid = (for (p <- sids.indices; i <- sids(p).indices)
        yield sids(p)(i) -> PLit(sids(p)(i), sps(p)(i), grps(p)(i), negs(p)(i))).toMap
      val formula: Seq[Wmc.SignedClause] = sids.lazyZip(negs)
        .map((is, ns) => is.zip(ns.map(n => !n)).toSet)
      val negated = Wmc.negate(formula)
      def weight(c: Wmc.SignedClause): Double =
        c.iterator.map { case (sid, pol) =>
          if (pol) bySid(sid).sp else 1.0 - bySid(sid).sp
        }.product
      val ranked = negated.sortBy(c => (-weight(c), c.toSeq.sorted.mkString(",")))
      val kept = ranked.take(retain).map(_.toSeq.sorted.map { case (sid, pol) =>
        bySid(sid).copy(neg = !pol)
      })
      PTag(kept, trunc || negated.size > retain)
    })
    tag => f(part(tag, "sid"), part(tag, "sp"), part(tag, "grp"),
      part(tag, "neg"), tag.getField("trunc")).cast(tagType)
  }

  /** The proofs semiring packaged for [[graft.reasoner.AnnotatedReasoner]]:
    * ⊗ across premises, ⊕ across alternative derivations of the same fact
    * (the ⊕ aggregate folds the group's tags with `disj`), ⊖ for the
    * stratified negation pass. */
  def semiring(retain: Int): graft.reasoner.Semiring =
    graft.reasoner.Semiring(
      times = cs => cs.reduce((a, b) => conj(a, b, retain)),
      plusAgg = c => aggregate(collect_list(c), zero, (acc, t) => disj(acc, t, retain)),
      plusPair = (a, b) => disj(a, b, retain),
      negate = Some(negTag(retain)),
      one = one,
      zero = zero)
}
