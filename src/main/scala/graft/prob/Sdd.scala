package graft.prob

import scala.collection.mutable

/** Thrown when SDD compilation exceeds its node budget — callers degrade
  * to the bounded/NeedsExact arm (the reference's
  * `SddBudgetError::NodeBudgetExceeded`, `shared/src/sdd.rs:85-121`). */
final class SddBudgetExceeded(val nodes: Int)
    extends RuntimeException(s"sdd node budget exceeded at $nodes nodes")

/** Bottom-up Sentential Decision Diagram compiler with exact weighted
  * model counting — the Spark rebuild of the reference's SDD engine
  * (`shared/src/sdd.rs`): right-linear vtree, apply with X-partition
  * cross-product + compression + trimming, unique table, apply/negate
  * caches, node budget, annotated-disjunction exclusive groups
  * (`sdd.rs:130-257`, `hybrid.rs:1353-1370`).
  *
  * Unlike the reference's process-global `Arc<Mutex<SddManager>>`, a
  * manager here is a small per-fact arena built inside a row-level UDF:
  * each fact row compiles its own lineage cone, so exact inference
  * distributes with the facts and needs no driver-side state. Variables
  * are dense Ints; [[Sdd.wmcOfDnf]] maps seed ids to them.
  *
  * Design differences from the reference (same semantics): the vtree
  * carries parent pointers (ancestor walks are O(depth), `sdd.rs:690-706`
  * rescans the arena), and decision-node construction funnels through one
  * builder that always compresses (`sdd.rs` splits unique_d /
  * make_decision_raw; compression of the two-element partitions built
  * during normalization is a no-op, so one path is safe).
  */
final class Sdd(maxNodes: Int = 1 << 20) {

  val False = 0
  val True = 1

  // node arena: kind per id (0=false,1=true,2=literal,3=decision)
  private val kind = mutable.ArrayBuffer[Byte](0, 1)
  private val litVar = mutable.ArrayBuffer[Int](-1, -1)
  private val litPol = mutable.ArrayBuffer[Boolean](false, false)
  private val decVtree = mutable.ArrayBuffer[Int](-1, -1)
  private val decElems = mutable.ArrayBuffer[Vector[(Int, Int)]](null, null)

  private val unique = mutable.HashMap.empty[AnyRef, Int]
  private val applyCache = mutable.HashMap.empty[(Int, Int, Boolean), Int]
  private val negCache = mutable.HashMap.empty[Int, Int]

  // right-linear vtree: new variables are prepended above the old root
  private val vtLeft = mutable.ArrayBuffer.empty[Int] // -1 for leaves
  private val vtRight = mutable.ArrayBuffer.empty[Int]
  private val vtParent = mutable.ArrayBuffer.empty[Int]
  private val vtVar = mutable.ArrayBuffer.empty[Int]
  private var vtRoot = -1
  private val varLeaf = mutable.HashMap.empty[Int, Int]

  private val posW = mutable.HashMap.empty[Int, Double]
  private val negW = mutable.HashMap.empty[Int, Double]
  private val exclusiveVar = mutable.HashMap.empty[Int, Boolean]

  def nodeCount: Int = kind.length

  /** Register a variable with explicit literal weights; extends the
    * right-linear vtree (`sdd.rs:186-227`). Independent Bernoulli =
    * (p, 1−p); exclusive-group member = (p, 1) (annotated disjunction). */
  def ensureVar(v: Int, pos: Double, neg: Double,
      exclusive: Boolean = false): Unit = {
    posW(v) = math.max(0.0, math.min(1.0, pos))
    negW(v) = math.max(0.0, math.min(1.0, neg))
    exclusiveVar(v) = exclusive
    if (!varLeaf.contains(v)) {
      val leaf = newVtNode(-1, -1, v)
      varLeaf(v) = leaf
      vtRoot =
        if (vtRoot < 0) leaf
        else {
          val internal = newVtNode(leaf, vtRoot, -1)
          vtParent(leaf) = internal
          vtParent(vtRoot) = internal
          internal
        }
    }
  }

  private def newVtNode(l: Int, r: Int, v: Int): Int = {
    vtLeft += l; vtRight += r; vtParent += -1; vtVar += v
    vtLeft.length - 1
  }

  private def alloc(k: Byte, v: Int, pol: Boolean, vt: Int,
      es: Vector[(Int, Int)]): Int = {
    if (kind.length >= maxNodes) throw new SddBudgetExceeded(kind.length)
    kind += k; litVar += v; litPol += pol; decVtree += vt; decElems += es
    kind.length - 1
  }

  def literal(v: Int, polarity: Boolean): Int = {
    require(varLeaf.contains(v), s"unregistered sdd variable $v")
    val key = ("lit", v, polarity)
    unique.getOrElseUpdate(key, alloc(2, v, polarity, -1, null))
  }

  private def vtreeOf(id: Int): Int = kind(id) match {
    case 2 => varLeaf(litVar(id))
    case 3 => decVtree(id)
    case _ => -1
  }

  private def ancestors(v: Int): List[Int] = {
    var cur = v
    var acc = List.empty[Int]
    while (cur >= 0) { acc = cur :: acc; cur = vtParent(cur) }
    acc // root .. v
  }

  /** Lowest common ancestor via the root-down ancestor paths. */
  private def lca(a: Int, b: Int): Int = {
    val pa = ancestors(a)
    val pb = ancestors(b)
    pa.zip(pb).takeWhile { case (x, y) => x == y }.last._1
  }

  private def isUnder(node: Int, top: Int): Boolean = {
    var cur = node
    while (cur >= 0) { if (cur == top) return true; cur = vtParent(cur) }
    false
  }

  /** Canonical decision node at `vtree`: drop false primes, compress
    * equal subs by OR-ing primes, apply both trimming rules, unique-table
    * (`sdd.rs:343-407`). */
  private def decision(vtree: Int, elements: Seq[(Int, Int)]): Int = {
    var es = elements.filter(_._1 != False).toVector
    // compression: {(p1,s),(p2,s)} → {(p1∨p2, s)}
    if (es.map(_._2).distinct.length != es.length)
      es = es.groupBy(_._2).iterator.map { case (sub, ps) =>
        (ps.map(_._1).reduce((x, y) => apply(x, y, and = false)), sub)
      }.toVector.filter(_._1 != False)
    if (es.isEmpty) return False
    if (es.length == 1 && es.head._1 == True) return es.head._2
    if (es.length == 2) {
      val Vector((p1, s1), (p2, s2)) = es
      if (s1 == True && s2 == False) return p1
      if (s2 == True && s1 == False) return p2
    }
    val sorted = es.sorted
    val key = ("dec", vtree, sorted)
    unique.getOrElseUpdate(key, alloc(3, -1, false, vtree, sorted))
  }

  /** X-partition of `id` at internal vtree node `vtree` (`sdd.rs:434-466`). */
  private def expand(id: Int, vtree: Int): Vector[(Int, Int)] = id match {
    case True => Vector((True, True))
    case False => Vector((True, False))
    case _ =>
      val v = vtreeOf(id)
      if (kind(id) == 3 && v == vtree) decElems(id)
      else if (isUnder(v, vtLeft(vtree))) Vector((id, True), (negate(id), False))
      else Vector((True, id))
  }

  /** Boolean apply — `and = true` for ∧, false for ∨ (`sdd.rs:468-583`). */
  def apply(a: Int, b: Int, and: Boolean): Int = {
    if (and) {
      if (a == False || b == False) return False
      if (a == True) return b
      if (b == True) return a
    } else {
      if (a == True || b == True) return True
      if (a == False) return b
      if (b == False) return a
    }
    if (a == b) return a
    if (kind(a) == 2 && kind(b) == 2 && litVar(a) == litVar(b) &&
        litPol(a) != litPol(b)) return if (and) False else True
    val key = if (a <= b) (a, b, and) else (b, a, and)
    applyCache.getOrElseUpdate(key, {
      val va = vtreeOf(a)
      val vb = vtreeOf(b)
      val target =
        if (va < 0) vb
        else if (vb < 0) va
        else if (va == vb) va
        else if (isUnder(va, vb)) vb
        else if (isUnder(vb, va)) va
        else lca(va, vb)
      // a cross product needs an internal node; a leaf target means both
      // operands are literals of the same variable with equal polarity —
      // already caught above, so target here is internal unless equal ids
      val ea = expand(a, target)
      val eb = expand(b, target)
      val elems = for {
        (pa, sa) <- ea
        (pb, sb) <- eb
        prime = apply(pa, pb, and = true)
        if prime != False
      } yield (prime, apply(sa, sb, and))
      decision(target, elems)
    })
  }

  def conjoin(a: Int, b: Int): Int = apply(a, b, and = true)
  def disjoin(a: Int, b: Int): Int = apply(a, b, and = false)

  /** ¬: negate the subs, keep the primes (`sdd.rs:715-737`). */
  def negate(id: Int): Int = id match {
    case False => True
    case True => False
    case _ =>
      negCache.getOrElseUpdate(id, kind(id) match {
        case 2 => literal(litVar(id), !litPol(id))
        case 3 =>
          val es = decElems(id).map { case (p, s) => (p, negate(s)) }
          decision(decVtree(id), es)
      })
  }

  /** Exactly-one-of constraint for an exclusive group (`sdd.rs:229-251`). */
  def exactlyOne(vars: Seq[Int]): Int = vars match {
    case Seq() => False
    case Seq(v) => literal(v, polarity = true)
    case v +: rest =>
      val allFalse = rest.foldLeft(True)((acc, r) =>
        conjoin(acc, literal(r, polarity = false)))
      disjoin(
        conjoin(literal(v, polarity = true), allFalse),
        conjoin(literal(v, polarity = false), exactlyOne(rest)))
  }

  /** Weighted model count, O(|SDD|) with memoization (`sdd.rs:739-777`). */
  def wmc(id: Int): Double = {
    val memo = mutable.HashMap.empty[Int, Double]
    def go(n: Int): Double = n match {
      case False => 0.0
      case True => 1.0
      case _ => memo.getOrElseUpdate(n, kind(n) match {
        case 2 => if (litPol(n)) posW(litVar(n)) else negW(litVar(n))
        case 3 => decElems(n).iterator.map { case (p, s) => go(p) * go(s) }.sum
      })
    }
    go(id)
  }

  /** ∂WMC/∂p(v) for every registered variable — the reference's
    * differentiable-WMC surface (`shared/src/diff_sdd.rs:15-46`): for an
    * independent Bernoulli (weights p, 1−p) the gradient is
    * WMC[v↦(1,0)] − WMC[v↦(0,1)] (WMC is multilinear in the literal
    * weights); for an annotated-disjunction member (weights p, 1) only
    * the positive term applies. Weights are restored afterwards; near-
    * zero gradients are dropped like the reference. O(|vars|) wmc passes
    * over one arena — fine for the per-fact row-level arenas this engine
    * builds ([[Sdd]] class doc). */
  def wmcGradient(id: Int): Map[Int, Double] = {
    val grads = Map.newBuilder[Int, Double]
    posW.keys.toSeq.sorted.foreach { v =>
      val (origPos, origNeg) = (posW(v), negW(v))
      posW(v) = 1.0; negW(v) = 0.0
      val aV = wmc(id)
      val grad =
        if (exclusiveVar.getOrElse(v, false)) aV
        else {
          posW(v) = 0.0; negW(v) = 1.0
          aV - wmc(id)
        }
      posW(v) = origPos; negW(v) = origNeg
      if (math.abs(grad) > 1e-15) grads += v -> grad
    }
    grads.result()
  }

  /** Satisfying assignments — explanation-time only (`sdd.rs:780-812`). */
  def models(id: Int): Seq[Set[(Int, Boolean)]] = id match {
    case False => Nil
    case True => Seq(Set.empty)
    case _ => kind(id) match {
      case 2 => Seq(Set((litVar(id), litPol(id))))
      case 3 => decElems(id).flatMap { case (p, s) =>
        if (s == False) Nil
        else for (pm <- models(p); sm <- models(s)) yield pm ++ sm
      }
    }
  }
}

object Sdd {

  /** Compile a positive proof DNF over independent and exclusive-group
    * seeds to an SDD and return its exact WMC. Matches [[Wmc.exact]]'s
    * semantics: an exclusive group branches over its members appearing in
    * the formula plus a none-of-them arm weighted 1 − Σp — encoded, as in
    * the reference, with neg-weight-1 member literals and an exactly-one
    * constraint (`hybrid.rs:1353-1370`), here over the appearing members
    * plus a phantom "none" variable carrying the residual mass.
    *
    * Throws [[SddBudgetExceeded]] when the arena outgrows `maxNodes` —
    * the hybrid ladder's sdd-budget escalation hook. */
  def wmcOfDnf(proofs: Seq[Set[Long]], probs: Map[Long, Double],
      groups: Map[Long, Long] = Map.empty, maxNodes: Int = 1 << 20): Double = {
    if (proofs.isEmpty) return 0.0
    if (proofs.exists(_.isEmpty)) return 1.0
    val (m, _, constrained, _) = buildArena(proofs, probs, groups, maxNodes)
    m.wmc(constrained)
  }

  /** Shared arena construction for the DNF WMC/gradient pair: variable
    * registration (annotated-disjunction members exclusive), phantom
    * residual vars + exactly-one constraints, proofs → root. One builder
    * so the two entry points cannot diverge. */
  private def buildArena(proofs: Seq[Set[Long]], probs: Map[Long, Double],
      groups: Map[Long, Long], maxNodes: Int)
      : (Sdd, Map[Long, Int], Int, Map[Long, (Int, Boolean)]) = {
    val m = new Sdd(maxNodes)
    val seedIds = proofs.flatten.distinct.sorted
    val varOf = seedIds.zipWithIndex.toMap
    for (sid <- seedIds) {
      val p = probs(sid)
      if (groups.contains(sid)) m.ensureVar(varOf(sid), p, 1.0, exclusive = true)
      else m.ensureVar(varOf(sid), p, 1.0 - p)
    }
    // phantom none-vars carry each group's residual mass; report, per
    // group, the none var and whether the residual is un-clamped (the
    // gradient's chain-rule term vanishes once max(0, 1−Σp) clamps)
    var nextVar = seedIds.length
    val groupInfo = Map.newBuilder[Long, (Int, Boolean)]
    val constraints = seedIds.filter(groups.contains).groupBy(groups)
      .iterator.map { case (gid, members) =>
        val mass = 1.0 - members.map(probs).sum
        val none = nextVar
        nextVar += 1
        groupInfo += gid -> (none, mass > 0.0)
        m.ensureVar(none, math.max(0.0, mass), 1.0, exclusive = true)
        m.exactlyOne(members.map(varOf) :+ none)
      }.toList
    val root = proofs.map { proof =>
      proof.toSeq.sorted.map(sid => m.literal(varOf(sid), polarity = true))
        .reduce(m.conjoin)
    }.reduce(m.disjoin)
    (m, varOf, constraints.foldLeft(root)(m.conjoin), groupInfo.result())
  }

  /** ∂WMC/∂p(seed) over a DNF lineage — [[Sdd.wmcGradient]] lifted to
    * seed ids, same arena construction as [[wmcOfDnf]].
    *
    * For an annotated-disjunction member the per-variable partial is not
    * the whole story: the phantom none-var's weight is 1 − Σp over the
    * group, so dWMC/dp(member) = ∂WMC/∂w(member) − ∂WMC/∂w(none) by the
    * chain rule (the second term vanishes when the residual is clamped
    * at 0, where the subgradient of max is 0). Without the correction a
    * formula satisfiable through the none arm (any proof not using the
    * group) reports a too-large member gradient — e.g. proofs
    * [{m},{x}], p(m)=0.3, p(x)=0.5: WMC = p_m + (1−p_m)·p_x, true
    * gradient 1−p_x = 0.5, uncorrected 1.0.
    * Distributes like wmcOfDnf: one small arena per fact row. */
  def wmcGradientOfDnf(proofs: Seq[Set[Long]], probs: Map[Long, Double],
      groups: Map[Long, Long] = Map.empty,
      maxNodes: Int = 1 << 20): Map[Long, Double] = {
    if (proofs.isEmpty || proofs.exists(_.isEmpty)) return Map.empty
    val (m, varOf, constrained, groupInfo) = buildArena(proofs, probs, groups, maxNodes)
    val byVar = m.wmcGradient(constrained)
    varOf.flatMap { case (sid, v) =>
      val direct = byVar.getOrElse(v, 0.0)
      val total = groups.get(sid).flatMap(groupInfo.get) match {
        case Some((noneVar, residualLive)) if residualLive =>
          direct - byVar.getOrElse(noneVar, 0.0)
        case _ => direct
      }
      if (math.abs(total) > 1e-15) Some(sid -> total) else None
    }
  }

  /** Exact WMC of a SIGNED DNF over independent seeds — the SDD engine's
    * negative literals carry weight 1−p natively, so negation-aware
    * lineage (`provenance.rs:322-420` signed clauses) compiles directly:
    * no De Morgan expansion needed. */
  def wmcOfSignedDnf(clauses: Seq[Set[(Long, Boolean)]],
      probs: Map[Long, Double], maxNodes: Int = 1 << 20): Double = {
    if (clauses.isEmpty) return 0.0
    if (clauses.exists(_.isEmpty)) return 1.0
    val m = new Sdd(maxNodes)
    val seedIds = clauses.flatMap(_.map(_._1)).distinct.sorted
    val varOf = seedIds.zipWithIndex.toMap
    for (sid <- seedIds) m.ensureVar(varOf(sid), probs(sid), 1.0 - probs(sid))
    val root = clauses.map { clause =>
      clause.toSeq.sortBy(_._1)
        .map { case (sid, pol) => m.literal(varOf(sid), pol) }
        .reduce(m.conjoin)
    }.reduce(m.disjoin)
    m.wmc(root)
  }
}
