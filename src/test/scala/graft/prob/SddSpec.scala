package graft.prob

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** SDD engine checks: hand-computed WMCs, a differential oracle against
  * the Shannon-expansion evaluator ([[Wmc.exact]]) on random DNFs —
  * mirroring the reference's apply/wmc tests (`shared/src/sdd.rs` test
  * module) — plus budget, negation, and model-enumeration behavior.
  */
class SddSpec extends AnyFunSuite {

  test("literal, conjunction, disjunction WMCs match hand values") {
    val m = new Sdd()
    m.ensureVar(0, 0.3, 0.7)
    m.ensureVar(1, 0.5, 0.5)
    val a = m.literal(0, polarity = true)
    val b = m.literal(1, polarity = true)
    assert(m.wmc(a) === 0.3)
    assert(m.wmc(m.conjoin(a, b)) === 0.15)
    assert(math.abs(m.wmc(m.disjoin(a, b)) - (0.3 + 0.5 - 0.15)) < 1e-12)
    assert(m.wmc(m.conjoin(a, m.negate(a))) === 0.0)
    assert(m.wmc(m.disjoin(a, m.negate(a))) === 1.0)
  }

  test("shared-variable DNF: absorption and inclusion-exclusion") {
    // F = a ∨ (a ∧ b) = a
    val p = Map(0L -> 0.3, 1L -> 0.5)
    assert(Sdd.wmcOfDnf(Seq(Set(0L), Set(0L, 1L)), p) === 0.3)
    // F = (a∧b) ∨ (a∧c): P = p_a (p_b + p_c − p_b p_c)
    val p2 = Map(0L -> 0.5, 1L -> 0.25, 2L -> 0.125)
    val expected = 0.5 * (0.25 + 0.125 - 0.25 * 0.125)
    assert(math.abs(Sdd.wmcOfDnf(Seq(Set(0L, 1L), Set(0L, 2L)), p2) - expected) < 1e-12)
  }

  test("differential vs Shannon expansion on random DNFs") {
    val rnd = new Random(7)
    for (trial <- 1 to 40) {
      val nVars = 2 + rnd.nextInt(6)
      val probs = (0L until nVars.toLong).map(v => v -> (0.05 + 0.9 * rnd.nextDouble())).toMap
      val nClauses = 1 + rnd.nextInt(5)
      val dnf = (1 to nClauses).map { _ =>
        val w = 1 + rnd.nextInt(3)
        (1 to w).map(_ => rnd.nextInt(nVars).toLong).toSet
      }
      val viaSdd = Sdd.wmcOfDnf(dnf, probs)
      val viaShannon = Wmc.exact(dnf, probs)
      assert(math.abs(viaSdd - viaShannon) < 1e-10,
        s"trial $trial: sdd=$viaSdd shannon=$viaShannon dnf=$dnf")
    }
  }

  test("differential vs Shannon with exclusive groups") {
    val rnd = new Random(11)
    for (trial <- 1 to 25) {
      val nVars = 3 + rnd.nextInt(4)
      // group 0: vars {0,1} mutually exclusive with leftover mass
      val groups = Map(0L -> 0L, 1L -> 0L)
      val pg = 0.05 + 0.4 * rnd.nextDouble()
      val probs = Map(0L -> pg, 1L -> (0.45 - 0.4 * rnd.nextDouble() * 0.5)) ++
        (2L until nVars.toLong).map(v => v -> (0.05 + 0.9 * rnd.nextDouble())).toMap
      val nClauses = 1 + rnd.nextInt(4)
      val dnf = (1 to nClauses).map { _ =>
        val w = 1 + rnd.nextInt(3)
        (1 to w).map(_ => rnd.nextInt(nVars).toLong).toSet
      }
      val viaSdd = Sdd.wmcOfDnf(dnf, probs, groups)
      val viaShannon = Wmc.exact(dnf, probs, groups)
      assert(math.abs(viaSdd - viaShannon) < 1e-10,
        s"trial $trial: sdd=$viaSdd shannon=$viaShannon dnf=$dnf probs=$probs")
    }
  }

  test("exclusive group: only one member fires") {
    // group {a: .3, b: .6}; F = a∧b is unsatisfiable under exactly-one
    val groups = Map(0L -> 9L, 1L -> 9L)
    val probs = Map(0L -> 0.3, 1L -> 0.6)
    assert(Sdd.wmcOfDnf(Seq(Set(0L, 1L)), probs, groups) === 0.0)
    assert(math.abs(Sdd.wmcOfDnf(Seq(Set(0L), Set(1L)), probs, groups) - 0.9) < 1e-12)
  }

  test("signed DNFs: Shannon ≡ SDD, and ¬F complements F") {
    val rnd = new Random(23)
    for (trial <- 1 to 30) {
      val nVars = 2 + rnd.nextInt(5)
      val probs = (0L until nVars.toLong).map(v => v -> (0.05 + 0.9 * rnd.nextDouble())).toMap
      val dnf: Seq[Wmc.SignedClause] = (1 to 1 + rnd.nextInt(4)).map { _ =>
        (1 to 1 + rnd.nextInt(3))
          .map(_ => (rnd.nextInt(nVars).toLong, rnd.nextBoolean())).toSet
      }
      val viaShannon = Wmc.exactSigned(dnf, probs)
      val viaSdd = Sdd.wmcOfSignedDnf(dnf, probs)
      assert(math.abs(viaShannon - viaSdd) < 1e-10,
        s"trial $trial: shannon=$viaShannon sdd=$viaSdd dnf=$dnf")
      // De Morgan complement evaluates to 1 − P(F)
      val comp = Wmc.exactSigned(Wmc.negate(dnf), probs)
      assert(math.abs(viaShannon + comp - 1.0) < 1e-10,
        s"trial $trial: P=$viaShannon P(neg)=$comp dnf=$dnf")
    }
  }

  test("node budget aborts compilation") {
    val probs = (0L until 24L).map(_ -> 0.5).toMap
    // 12 disjoint two-var clauses blow a 60-node arena
    val dnf = (0L until 24L by 2).map(v => Set(v, v + 1))
    intercept[SddBudgetExceeded] { Sdd.wmcOfDnf(dnf, probs, maxNodes = 60) }
  }

  test("negation complements the model count") {
    val m = new Sdd()
    for (v <- 0 to 3) m.ensureVar(v, 0.25 * (v + 1) / 2, 1.0 - 0.25 * (v + 1) / 2)
    val f = m.disjoin(
      m.conjoin(m.literal(0, polarity = true), m.literal(1, polarity = true)),
      m.conjoin(m.literal(2, polarity = true), m.literal(3, polarity = true)))
    assert(math.abs(m.wmc(f) + m.wmc(m.negate(f)) - 1.0) < 1e-12)
  }

  test("wmc gradient matches central finite differences (independent vars)") {
    // the reference's own differential test shape (`diff_sdd.rs:48+`)
    val m = new Sdd()
    m.ensureVar(0, 0.7, 0.3)
    m.ensureVar(1, 0.2, 0.8)
    m.ensureVar(2, 0.5, 0.5)
    // f = (x0 ∧ x1) ∨ ¬x2
    val f = m.disjoin(
      m.conjoin(m.literal(0, polarity = true), m.literal(1, polarity = true)),
      m.literal(2, polarity = false))
    val grads = m.wmcGradient(f)
    // analytic: WMC = p0·p1·p2 + (1−p2); ∂/∂p0 = p1·p2, ∂/∂p1 = p0·p2,
    // ∂/∂p2 = p0·p1 − 1
    assert(math.abs(grads(0) - 0.2 * 0.5) < 1e-12)
    assert(math.abs(grads(1) - 0.7 * 0.5) < 1e-12)
    assert(math.abs(grads(2) - (0.7 * 0.2 - 1)) < 1e-12)
  }

  test("wmc gradient over DNF lineage with exclusive groups") {
    // two seeds in one annotated-disjunction group + one independent
    val proofs = Seq(Set(1L, 3L), Set(2L, 3L))
    val probs = Map(1L -> 0.3, 2L -> 0.4, 3L -> 0.9)
    val groups = Map(1L -> 100L, 2L -> 100L)
    // WMC = (p1 + p2) · p3  (group members are mutually exclusive)
    val w = Sdd.wmcOfDnf(proofs, probs, groups)
    assert(math.abs(w - (0.3 + 0.4) * 0.9) < 1e-12)
    val g = Sdd.wmcGradientOfDnf(proofs, probs, groups)
    // ∂/∂p1 = p3, ∂/∂p2 = p3, ∂/∂p3 = p1 + p2
    assert(math.abs(g(1L) - 0.9) < 1e-12)
    assert(math.abs(g(2L) - 0.9) < 1e-12)
    assert(math.abs(g(3L) - 0.7) < 1e-12)
    // finite-difference cross-check on the independent seed
    val eps = 1e-6
    val fd = (Sdd.wmcOfDnf(proofs, probs + (3L -> (0.9 + eps)), groups) -
      Sdd.wmcOfDnf(proofs, probs + (3L -> (0.9 - eps)), groups)) / (2 * eps)
    assert(math.abs(g(3L) - fd) < 1e-6)
  }

  test("group-member gradient includes the residual chain term (none arm live)") {
    // proofs [{m}, {x}] with m in a group: WMC = p_m + (1−p_m)·p_x —
    // the none arm can satisfy the formula through {x}, so the phantom
    // residual weight (1 − p_m) carries a −∂WMC/∂w_none chain term the
    // per-variable partial misses (review finding, r6 session 3)
    val proofs = Seq(Set(1L), Set(2L))
    val probs = Map(1L -> 0.3, 2L -> 0.5)
    val groups = Map(1L -> 7L)
    val w = Sdd.wmcOfDnf(proofs, probs, groups)
    assert(math.abs(w - (0.3 + 0.7 * 0.5)) < 1e-12)
    val g = Sdd.wmcGradientOfDnf(proofs, probs, groups)
    // d/dp_m (p_m + (1−p_m)·p_x) = 1 − p_x
    assert(math.abs(g(1L) - 0.5) < 1e-12)
    // finite differences on the GROUP member (residual recomputes per call)
    val eps = 1e-6
    val fd = (Sdd.wmcOfDnf(proofs, probs + (1L -> (0.3 + eps)), groups) -
      Sdd.wmcOfDnf(proofs, probs + (1L -> (0.3 - eps)), groups)) / (2 * eps)
    assert(math.abs(g(1L) - fd) < 1e-6)
    // two-member group + outside proof: both members get the correction
    val proofs2 = Seq(Set(1L), Set(4L), Set(9L))
    val probs2 = Map(1L -> 0.2, 4L -> 0.3, 9L -> 0.4)
    val groups2 = Map(1L -> 7L, 4L -> 7L)
    val g2 = Sdd.wmcGradientOfDnf(proofs2, probs2, groups2)
    for (s <- Seq(1L, 4L)) {
      val fd2 = (Sdd.wmcOfDnf(proofs2, probs2 + (s -> (probs2(s) + eps)), groups2) -
        Sdd.wmcOfDnf(proofs2, probs2 + (s -> (probs2(s) - eps)), groups2)) / (2 * eps)
      assert(math.abs(g2(s) - fd2) < 1e-6, s"seed $s: ${g2(s)} vs fd $fd2")
    }
    // clamped residual (Σp ≥ 1): chain term drops — subgradient 0
    val probs3 = Map(1L -> 0.6, 4L -> 0.4, 9L -> 0.4)
    val g3 = Sdd.wmcGradientOfDnf(proofs2, probs3, groups2)
    assert(g3.contains(1L)) // still finite, no crash
  }

  test("model enumeration covers the DNF") {
    val m = new Sdd()
    m.ensureVar(0, 0.5, 0.5); m.ensureVar(1, 0.5, 0.5)
    val f = m.disjoin(m.literal(0, polarity = true), m.literal(1, polarity = true))
    val ms = m.models(f)
    // every model satisfies a∨b; the three satisfying assignments are
    // reachable through the decision's partition
    assert(ms.nonEmpty)
    assert(ms.forall(mod => mod.contains((0, true)) || mod.contains((1, true)) ||
      mod.forall { case (_, pol) => pol }))
  }
}
