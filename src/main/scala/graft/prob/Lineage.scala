package graft.prob

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Top-k proof lineage as DataFrame columns — the Spark re-expression of
  * the reference's `TopKProofs` provenance (`shared/src/provenance.rs:191-320`)
  * and the lineage cones `evaluate_topk` enumerates
  * (`shared/src/hybrid.rs:1160-1240`).
  *
  * A tag is `struct(proofs, trunc)`:
  *   - `proofs`: `array<array<struct<sid:bigint, sp:double>>>` — up to
  *     `retain` proofs ranked by descending probability; each proof is the
  *     canonical (sid-sorted, deduped) set of contributing seeds with their
  *     probabilities carried inline, so proof probability is computable
  *     without a seed-table join
  *   - `trunc`: true iff any ⊕/⊗ along the derivation dropped proofs —
  *     when false the retained set is the COMPLETE proof enumeration and
  *     WMC over it is exact (the reference's `ResidualMass::Exhausted`)
  *
  * All operators are Catalyst higher-order functions (`transform`,
  * `aggregate`, `array_sort` with comparator) — per-row, narrow, no
  * shuffle beyond the ⊕ groupBy the reasoner already does. This is what
  * makes lineage viable at 100 TB: the reference's `Mutex<LineageStore>`
  * DAG is driver-global state; here every fact row carries its own cone.
  */
object Lineage {

  val tagType =
    "struct<proofs:array<array<struct<sid:bigint,sp:double,grp:bigint>>>,trunc:boolean>"

  /** ∏ seed probabilities of one proof. */
  def proofProb(p: Column): Column =
    aggregate(p, lit(1.0), (acc, x) => acc * x.getField("sp"))

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

  def zero: Column =
    mkTag(array().cast("array<array<struct<sid:bigint,sp:double,grp:bigint>>>"), lit(false))

  /** Seed tag: one proof containing the single seed (sid, sp, grp);
    * grp = -1 marks an independent seed, a non-negative grp groups
    * mutually exclusive alternatives (`hybrid.rs:62-66` SeedKind). */
  def seedTag(sid: Column, sp: Column, grp: Column = lit(-1L)): Column =
    mkTag(array(array(struct(sid.cast("bigint").as("sid"), sp.cast("double").as("sp"),
      grp.cast("bigint").as("grp")))), lit(false))

  /** ⊕ — union of the two proof sets, ranked, truncated (`provenance.rs:226-238`). */
  def disj(a: Column, b: Column, retain: Int): Column = {
    val merged = array_distinct(concat(a.getField("proofs"), b.getField("proofs")))
    mkTag(rankKeep(merged, retain),
      a.getField("trunc") || b.getField("trunc") || (size(merged) > retain))
  }

  /** ⊗ — cartesian product with seed-set merge (`provenance.rs:240-257`):
    * each pair of proofs unions its seeds (canonical: sid-sorted, deduped). */
  def conj(a: Column, b: Column, retain: Int): Column = {
    val cart = flatten(transform(a.getField("proofs"),
      pa => transform(b.getField("proofs"),
        pb => array_sort(array_distinct(concat(pa, pb))))))
    val merged = array_distinct(cart)
    mkTag(rankKeep(merged, retain),
      a.getField("trunc") || b.getField("trunc") || (size(merged) > retain))
  }

  /** The proofs semiring packaged for [[graft.reasoner.AnnotatedReasoner]]:
    * ⊗ across premises, ⊕ across alternative derivations of the same fact
    * (the ⊕ aggregate folds the group's tags with `disj`). */
  def semiring(retain: Int): graft.reasoner.Semiring =
    graft.reasoner.Semiring(
      times = cs => cs.reduce((a, b) => conj(a, b, retain)),
      plusAgg = c => aggregate(collect_list(c), zero, (acc, t) => disj(acc, t, retain)),
      plusPair = (a, b) => disj(a, b, retain))
}
