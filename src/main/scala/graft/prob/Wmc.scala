package graft.prob

/** Exact weighted model counting over a positive DNF of independent seeds
  * — the evaluation core behind the reference's exact provenances
  * (`shared/src/provenance.rs:336+` DnfWmcProvenance's Shannon expansion;
  * `shared/src/sdd.rs` computes the same quantity via SDD compilation).
  *
  * Shannon expansion with memoization on the canonicalized residual
  * formula: P(F) = p(v)·P(F|v=1) + (1−p(v))·P(F|v=0), picking the most
  * frequent variable so conditioning collapses the formula fast.
  * Subsumed clauses are absorbed at every step (A ∨ (A∧B) = A), matching
  * `remove_subsumed` (`provenance.rs:354-361`).
  *
  * Pure per-fact computation: runs inside row-level UDFs, distributed
  * with the facts — no driver-global state.
  */
object Wmc {

  type Clause = List[Long] // sorted seed ids

  /** Exact probability of the DNF `proofs` under seed probabilities
    * `probs`. Seeds sharing a non-negative id in `groups` are MUTUALLY
    * EXCLUSIVE alternatives (the reference's `SeedKind::ExclusiveGroup`,
    * `hybrid.rs:62-66`): at most one fires, so the expansion branches
    * over the group's members plus a none-of-them arm instead of the
    * independent true/false split. Empty DNF = false (0); an empty
    * clause = true (1). */
  def exact(proofs: Seq[Set[Long]], probs: Map[Long, Double],
      groups: Map[Long, Long] = Map.empty): Double = {
    if (proofs.isEmpty) return 0.0
    if (proofs.exists(_.isEmpty)) return 1.0
    val memo = scala.collection.mutable.HashMap.empty[List[Clause], Double]
    def minimize(cs: List[Clause]): List[Clause] = {
      val sets = cs.map(_.toSet).distinct
      sets.filterNot(c => sets.exists(o => o != c && o.subsetOf(c)))
        .map(_.toList.sorted).sortBy(c => (c.length, c.mkString(",")))
    }
    def groupOf(v: Long): Long = groups.getOrElse(v, -1L)
    def eval(cs: List[Clause]): Double = {
      if (cs.isEmpty) return 0.0
      if (cs.exists(_.isEmpty)) return 1.0
      if (cs.size == 1 && groups.isEmpty) return cs.head.iterator.map(probs).product
      memo.getOrElseUpdate(cs, {
        // branch on the most frequent variable
        val v = cs.flatten.groupBy(identity).maxBy { case (id, occ) => (occ.size, -id) }._1
        val g = groupOf(v)
        if (g < 0) {
          val whenTrue = minimize(cs.map(_.filterNot(_ == v)))
          val whenFalse = cs.filterNot(_.contains(v))
          val p = probs(v)
          p * eval(whenTrue) + (1.0 - p) * eval(whenFalse)
        } else {
          // multi-valued branch: each member of the group in the formula
          // fires (its siblings false), or none of them does
          val members = cs.flatten.filter(groupOf(_) == g).distinct.sorted
          val noneBranch = cs.filterNot(_.exists(members.contains))
          val memberTerms = members.map { m =>
            val conditioned = cs
              .filterNot(c => c.exists(x => members.contains(x) && x != m))
              .map(_.filterNot(_ == m))
            probs(m) * eval(minimize(conditioned))
          }.sum
          memberTerms + (1.0 - members.map(probs).sum) * eval(minimize(noneBranch))
        }
      })
    }
    math.max(0.0, math.min(1.0, eval(minimize(proofs.map(_.toList.sorted).toList))))
  }
}
