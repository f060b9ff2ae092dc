package graft.reasoner

import org.apache.spark.sql.DataFrame
import graft.model.TermLex
import graft.sparql.Ast._

/** Backward chaining: SLD-style top-down resolution with unification,
  * including quoted-triple unification — rebuilt from the behavior of
  * `datalog/src/reasoning/backward_chaining.rs:7-206`.
  *
  * Driver-side by design, like the reference: goals and rule sets are
  * small; the fact base is collected once (the reference's is in-memory
  * too). For large-scale materialization use the forward fixpoint
  * ([[Reasoner]]) — this exists for goal-directed queries over modest
  * fact sets.
  */
class BackwardChainer(facts: Set[(String, String, String)], rules: Seq[Rule],
    maxDepth: Int = 64) {

  type Subst = Map[String, String]

  /** Monotonic id per RULE APPLICATION for variable freshening. A
    * depth-based prefix is not enough: two sibling subgoals at the same
    * depth resolved by the same rule would share renamed variables and
    * capture each other's bindings (review finding — pair(?x,?y) over
    * q/base derived only the diagonal). */
  private var freshId = 0L

  private def applySubst(t: Term, s: Subst): Term = t match {
    case Var(n) => s.get(n).map(Lit(_)).getOrElse(Var(n))
    case Quoted(a, b, c) => Quoted(applySubst(a, s), applySubst(b, s), applySubst(c, s))
    case other => other
  }

  /** Unify a pattern term against a ground lexical value. */
  private def unify(t: Term, v: String, s: Subst): Option[Subst] = t match {
    case Var(n) => s.get(n) match {
      case Some(bound) => if (bound == v) Some(s) else None
      case None => Some(s + (n -> v))
    }
    case Iri(x) => if (x == v) Some(s) else None
    case Lit(x) => if (x == v) Some(s) else None
    case Quoted(a, b, c) =>
      TermLex.decodeQuoted(v).flatMap { case (vs, vp, vo) =>
        unify(a, vs, s).flatMap(s1 => unify(b, vp, s1)).flatMap(s2 => unify(c, vo, s2))
      }
  }

  private def unifyPattern(tp: TriplePattern, f: (String, String, String),
      s: Subst): Option[Subst] =
    unify(tp.s, f._1, s).flatMap(s1 => unify(tp.p, f._2, s1))
      .flatMap(s2 => unify(tp.o, f._3, s2))

  /** Dereference var→var links (`?name` values) introduced by goal/head
    * unification down to ground values. */
  private def deref(v: String, s: Subst, seen: Set[String] = Set.empty): String =
    if (v.startsWith("?")) {
      val n = v.drop(1)
      if (seen(n)) v else s.get(n).map(deref(_, s, seen + n)).getOrElse(v)
    } else v

  /** Prove one goal, yielding all ground solution substitutions. */
  def solve(goal: TriplePattern): LazyList[Subst] =
    solveInner(goal, Map.empty, 0)
      .map(s => s.map { case (k, v) => k -> deref(v, s) })
      .distinct

  private def solveInner(goal: TriplePattern, s0: Subst, depth: Int): LazyList[Subst] = {
    if (depth > maxDepth) return LazyList.empty
    val g = TriplePattern(applySubst(goal.s, s0), applySubst(goal.p, s0), applySubst(goal.o, s0))
    val fromFacts = LazyList.from(facts).flatMap(f => unifyPattern(g, f, s0))
    val fromRules = LazyList.from(rules).flatMap { r =>
      // freshen rule variables per USE (not per depth)
      freshId += 1
      val fresh = s"_u${freshId}_"
      def rename(t: Term): Term = t match {
        case Var(n) => Var(fresh + n)
        case Quoted(a, b, c) => Quoted(rename(a), rename(b), rename(c))
        case other => other
      }
      r.conclusion.to(LazyList).flatMap { concl =>
        val head = TriplePattern(rename(concl.s), rename(concl.p), rename(concl.o))
        // unify goal with head structurally
        unifyTerms(g, head, s0).to(LazyList).flatMap { s1 =>
          val body = r.premise.map(tp =>
            TriplePattern(rename(tp.s), rename(tp.p), rename(tp.o)))
          body.foldLeft(LazyList(s1)) { (acc, tp) =>
            acc.flatMap(si => solveInner(tp, si, depth + 1))
          }
        }
      }
    }
    (fromFacts ++ fromRules).distinct
  }

  /** Structural unification of two patterns (goal may contain vars bound
    * in s; head vars are fresh). */
  private def unifyTerms(a: TriplePattern, b: TriplePattern, s: Subst): Option[Subst] = {
    def u(x: Term, y: Term, s: Subst): Option[Subst] = (applySubst(x, s), applySubst(y, s)) match {
      case (Var(n), other) => bindOrCheck(n, other, s)
      case (other, Var(n)) => bindOrCheck(n, other, s)
      case (Iri(p), Iri(q)) => if (p == q) Some(s) else None
      case (Lit(p), Lit(q)) => if (p == q) Some(s) else None
      case (Iri(p), Lit(q)) => if (p == q) Some(s) else None
      case (Lit(p), Iri(q)) => if (p == q) Some(s) else None
      case (Quoted(p1, p2, p3), Quoted(q1, q2, q3)) =>
        u(p1, q1, s).flatMap(u(p2, q2, _)).flatMap(u(p3, q3, _))
      case (Quoted(_, _, _), Lit(v)) => unify(applySubst(x, s), v, s)
      case (Lit(v), Quoted(_, _, _)) => unify(applySubst(y, s), v, s)
      case _ => None
    }
    def bindOrCheck(n: String, t: Term, s: Subst): Option[Subst] = t match {
      case Var(m) if m == n => Some(s)
      case Var(m) => Some(s + (n -> ("?" + m))) // var-var link (rare; ground later)
      case other => Some(s + (n -> TermLex.lexical(other)))
    }
    u(a.s, b.s, s).flatMap(u(a.p, b.p, _)).flatMap(u(a.o, b.o, _))
  }

  /** Goal has a proof? */
  def prove(goal: TriplePattern): Boolean = solve(goal).nonEmpty
}

object BackwardChainer {
  /** Collect a facts DF (s,p,o) into a chainer. */
  def fromDF(facts: DataFrame, rules: Seq[Rule]): BackwardChainer =
    new BackwardChainer(
      facts.select("s", "p", "o").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet,
      rules)
}
