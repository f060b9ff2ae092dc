package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JL projection semantics: driver-reference parity, sign determinism,
  * dimension guard, and the distance-preservation property that makes
  * the reduction usable ahead of LSH/k-means. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dIn = 16
  private val dOut = 8
  // decorrelated pseudo-random coordinates (shader-hash construction) —
  // structured vectors (e.g. shifted sines) share difference directions
  // and a single fixed matrix stretches them systematically
  private def vec(id: Int): Seq[Float] = (0 until dIn).map { i =>
    val x = math.sin(id * 12.9898 + i * 78.233) * 43758.5453
    ((x - math.floor(x)) * 2 - 1).toFloat
  }

  private val df = (1 to 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("matches the driver-side reference projection") {
    val got = RandomProjection.jlProject(df, dIn, dOut)
      .as[(Long, Int, Double)].collect()
      .map { case (id, j, p) => (id, j) -> p }.toMap
    for (id <- 1 to 40; j <- 0 until dOut) {
      val x = vec(id)
      val ref = (0 until dIn).map(i =>
        x(i).toDouble * RandomProjection.sign("jl", i, j)).sum / math.sqrt(dOut)
      assert(math.abs(got((id.toLong, j)) - ref) < 1e-6, s"($id,$j)")
    }
  }

  test("projection plan is exchange-free (narrow map only)") {
    val plan = RandomProjection.jlProject(df, dIn, dOut)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"JL projection must not shuffle:\n$plan")
  }

  test("pairwise distances are approximately preserved") {
    val proj = RandomProjection.jlProject(df, dIn, dOut)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3) }
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = (1 to 40).map(_.toLong)
    val ratios = for {
      a <- ids; b <- ids if a < b
      da = d2(vec(a.toInt).map(_.toDouble), vec(b.toInt).map(_.toDouble))
      if da > 1e-9
    } yield d2(proj(a), proj(b)) / da
    // JL with dOut=8 is coarse; assert the ratio is centered and bounded
    // (deterministic data + deterministic matrix — no flake)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"worst distortion ${ratios.min} / ${ratios.max}")
  }

  test("wrong-dimension vectors are rejected loudly") {
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      RandomProjection.jlProject(bad, dIn, dOut).collect()
    }
    assert(e.getMessage.contains("expected") ||
      Option(e.getCause).exists(_.getMessage.contains("expected")))
  }
}
