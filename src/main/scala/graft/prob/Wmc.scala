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

  // ---- signed DNFs (`provenance.rs:322-420` DnfWmcProvenance) -------------

  /** A signed clause: (seed id, polarity); polarity false = ¬seed. */
  type SignedClause = Set[(Long, Boolean)]

  /** Drop clauses containing x ∧ ¬x (`provenance.rs:363-368`). */
  def removeContradictory(f: Seq[SignedClause]): Seq[SignedClause] =
    f.filterNot(c => c.exists { case (v, pol) => c.contains((v, !pol)) })

  /** Drop clauses subsumed by a subset clause (`provenance.rs:353-360`). */
  def removeSubsumed(f: Seq[SignedClause]): Seq[SignedClause] = {
    val cs = f.distinct
    cs.filterNot(c => cs.exists(o => o != c && o.subsetOf(c)))
  }

  /** Exact WMC of a signed DNF over INDEPENDENT seeds — the reference's
    * `shannon_wmc` (`provenance.rs:370-395`): condition on the smallest
    * variable; the x=1 branch keeps clauses without ¬x, the x=0 branch
    * keeps clauses without x. */
  def exactSigned(formula: Seq[SignedClause], probs: Map[Long, Double]): Double = {
    val memo = scala.collection.mutable.HashMap.empty[Set[SignedClause], Double]
    def eval(f0: Seq[SignedClause]): Double = {
      val f = removeSubsumed(removeContradictory(f0))
      if (f.isEmpty) return 0.0
      if (f.exists(_.isEmpty)) return 1.0
      memo.getOrElseUpdate(f.toSet, {
        val x = f.flatMap(_.map(_._1)).min
        val p = probs(x)
        val whenTrue = f.filterNot(_.contains((x, false)))
          .map(_.filterNot(_._1 == x))
        val whenFalse = f.filterNot(_.contains((x, true)))
          .map(_.filterNot(_._1 == x))
        p * eval(whenTrue) + (1.0 - p) * eval(whenFalse)
      })
    }
    math.max(0.0, math.min(1.0, eval(formula)))
  }

  /** De Morgan complement of a signed DNF (`provenance.rs:416+`
    * DnfWmcProvenance::negate): ¬(∨ᵢ ∧ⱼ lᵢⱼ) = ∧ᵢ ∨ⱼ ¬lᵢⱼ, expanded back
    * to DNF clause-by-clause with contradiction/subsumption pruning —
    * exact, correlation-preserving. Worst case exponential in clause
    * count; callers cap the input (proof retention already bounds it). */
  def negate(formula: Seq[SignedClause]): Seq[SignedClause] = {
    if (formula.isEmpty) return Seq(Set.empty) // ¬false = true
    if (formula.exists(_.isEmpty)) return Nil // ¬true = false
    var acc: Seq[SignedClause] = Seq(Set.empty)
    formula.foreach { clause =>
      val sums = clause.toSeq.map { case (v, pol) => (v, !pol) }
      acc = removeSubsumed(removeContradictory(
        for (a <- acc; l <- sums) yield a + l))
      if (acc.isEmpty) return Nil
    }
    acc
  }
}
