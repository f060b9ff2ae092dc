package graft.reasoner

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.model.{QuadStore, TermLex}
import graft.sparql.Ast._

/** Integrity constraints and inconsistency-tolerant (IAR) query semantics —
  * the Spark rebuild of the reference's repairs machinery
  * (`datalog/src/reasoning.rs:131-186` violates/compute_repairs,
  * `datalog/src/reasoning/repairs.rs` query_with_repairs,
  * `datalog/src/reasoning/materialisation/semi_naive_with_repairs.rs`).
  *
  * A constraint is a [[Rule]] whose premise matching ANY binding is a
  * violation (the conclusion is ignored, as in the reference's
  * `Term::Constant(0)` placeholder head).
  *
  * Deliberately driver-side over a collected fact set, like the
  * reference: repair enumeration explores subsets of the violating facts
  * (exponential in the size of the tangle), which only makes sense on
  * driver-sized ABoxes. The distributed path stays consistent-by-
  * construction: repair the seeds here, then run the distributed
  * [[Reasoner]] fixpoint on the repaired store.
  */
object Repairs {

  type Fact = (String, String, String)
  type Binding = Map[String, String]

  private def matchTerm(t: Term, v: String, b: Binding): Option[Binding] = t match {
    case Var(n) => b.get(n) match {
      case Some(bound) => if (bound == v) Some(b) else None
      case None => Some(b + (n -> v))
    }
    case other => if (TermLex.lexical(other) == v) Some(b) else None
  }

  /** Match one pattern against one fact under a partial binding
    * (`rules.rs` matches_rule_pattern). */
  def matchPattern(tp: TriplePattern, f: Fact, b: Binding): Option[Binding] =
    matchTerm(tp.s, f._1, b).flatMap(matchTerm(tp.p, f._2, _))
      .flatMap(matchTerm(tp.o, f._3, _))

  /** All bindings of a conjunctive premise over the fact set. */
  def premiseBindings(premise: Seq[TriplePattern], facts: Set[Fact]): Seq[Binding] =
    premise.foldLeft(Seq(Map.empty: Binding)) { (bs, tp) =>
      bs.flatMap(b => facts.iterator.flatMap(f => matchPattern(tp, f, b)))
    }

  /** True iff any constraint's premise has a match (`reasoning.rs:137-146`). */
  def violates(constraints: Seq[Rule], facts: Set[Fact]): Boolean =
    constraints.exists(c => premiseBindings(c.premise, facts).nonEmpty)

  /** Maximal consistent subsets (`reasoning.rs:148-186`): breadth-first
    * removal of single facts from violating sets, keeping subset-maximal
    * consistent ones. `maxExplored` bounds the exponential frontier. */
  def computeRepairs(constraints: Seq[Rule], facts: Set[Fact],
      maxExplored: Int = 10000): Seq[Set[Fact]] = {
    var repairs = List.empty[Set[Fact]]
    val seen = scala.collection.mutable.Set.empty[Set[Fact]]
    var queue = List(facts)
    while (queue.nonEmpty && seen.size < maxExplored) {
      val current = queue.head
      queue = queue.tail
      if (seen.add(current)) {
        if (!violates(constraints, current)) {
          val maximal = repairs.forall(r => !(current.subsetOf(r) && current != r))
          if (maximal) repairs = current ::
            repairs.filterNot(r => r.subsetOf(current) && r != current)
        } else {
          // deterministic exploration order (the reference iterates a
          // HashSet; we sort so repeated runs agree)
          current.toSeq.sorted.foreach { f =>
            val shrunk = current - f
            if (!seen.contains(shrunk)) queue = shrunk :: queue
          }
        }
      }
    }
    repairs.reverse
  }

  /** IAR answers (`repairs.rs:10-45` query_with_repairs): bindings of the
    * query pattern present in EVERY repair. */
  def queryWithRepairs(constraints: Seq[Rule], facts: Set[Fact],
      query: TriplePattern): Seq[Binding] =
    computeRepairs(constraints, facts) match {
      case Nil => Nil
      case first +: rest =>
        val candidates = first.toSeq.sorted.flatMap(f => matchPattern(query, f, Map.empty))
        candidates.distinct.filter { b =>
          rest.forall(_.exists(f => matchPattern(query, f, Map.empty).contains(b)))
        }
    }

  private def instantiate(tp: TriplePattern, b: Binding): Option[Fact] = {
    def term(t: Term): Option[String] = t match {
      case Var(n) => b.get(n)
      case other => Some(TermLex.lexical(other))
    }
    for (s <- term(tp.s); p <- term(tp.p); o <- term(tp.o)) yield (s, p, o)
  }

  /** Semi-naive inference under constraints
    * (`semi_naive_with_repairs.rs:11-80`): if the seeds are inconsistent,
    * replace them with the LARGEST repair; then derive to fixpoint,
    * skipping any conclusion whose insertion would violate a constraint.
    * Conclusions are applied in sorted order per round (the reference's
    * order is HashSet-iteration-dependent; sorting makes ours stable).
    * Returns (final facts, newly inferred facts in application order). */
  def inferWithRepairs(rules: Seq[Rule], constraints: Seq[Rule],
      seeds: Set[Fact], maxRounds: Int = 100): (Set[Fact], Seq[Fact]) = {
    var facts = if (violates(constraints, seeds)) {
      val rs = computeRepairs(constraints, seeds)
      if (rs.isEmpty) seeds else rs.maxBy(r => (r.size, r.toSeq.sorted.mkString("|")))
    } else seeds
    val inferred = scala.collection.mutable.ArrayBuffer.empty[Fact]
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      changed = false
      val candidates = rules.flatMap { r =>
        premiseBindings(r.premise, facts)
          .filter(b => r.negativePremise.forall(ntp =>
            !facts.exists(f => matchPattern(ntp, f, b).isDefined)))
          .flatMap(b => r.conclusion.flatMap(instantiate(_, b)))
      }.distinct.sorted
      candidates.foreach { f =>
        if (!facts.contains(f) && !violates(constraints, facts + f)) {
          facts += f
          inferred += f
          changed = true
        }
      }
      round += 1
    }
    (facts, inferred.toSeq)
  }

  // ---- store-facing wrappers ---------------------------------------------

  private def collectFacts(store: QuadStore): Set[Fact] =
    store.quads.filter(col("g").isNull).select("s", "p", "o")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  /** IAR query over a store's default graph. */
  def queryStore(store: QuadStore, constraints: Seq[Rule],
      query: TriplePattern): Seq[Binding] =
    queryWithRepairs(constraints, collectFacts(store), query)

  /** Repair-then-infer over a store's default graph; the repaired closure
    * replaces the default graph (the reference rebuilds its DatasetIndex
    * from the chosen repair, `semi_naive_with_repairs.rs:16-27`). */
  def materializeStore(store: QuadStore, rules: Seq[Rule],
      constraints: Seq[Rule]): Seq[Fact] = {
    val (facts, inferred) = inferWithRepairs(rules, constraints, collectFacts(store))
    val spark = store.spark
    import spark.implicits._
    store.delete(store.quads.filter(col("g").isNull))
    store.insert(facts.toSeq.toDF("s", "p", "o")
      .withColumn("g", lit(null).cast(StringType)))
    inferred
  }
}
