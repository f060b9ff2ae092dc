package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns
  * (Achlioptas 2003 ±1 variant): y_j = (1/√dOut)·Σ_i x_i·s_{ij} with
  * s_{ij} ∈ {+1,−1} drawn from the md5-60 hash of (seed, i, j) — fully
  * deterministic, so DuckDB reproduces the projection bit-for-bit and
  * the same matrix regenerates on any cluster without shipping state.
  * JL: pairwise distances are preserved within ε with dOut = O(log n/ε²),
  * which is what makes 64→16 (or 1024→64) reduction safe ahead of
  * LSH bucketing or k-means at corpus scale.
  *
  * Scale shape: the sign matrix is a dIn×dOut literal (KB-sized,
  * embedded in the plan — nothing broadcasts, nothing shuffles) and the
  * projection is per-row `transform`/`zip_with`/`aggregate` HOFs — a
  * NARROW map over the corpus, exchange-free by construction.
  */
object RandomProjection {

  /** Deterministic sign for (seed, i, j): +1 if md5-60("seed|i|j") is
    * even, −1 otherwise (the DuckDB mirror computes the same). */
  private[pipeline] def sign(seed: String, i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$i|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0) 1.0 else -1.0
  }

  /** Project `vecCol` (array<float|double>, length dIn) to a dOut-dim
    * array<double>. */
  def jlProjectVec(vec: Column, dIn: Int, dOut: Int,
      seed: String = "jl"): Column = {
    require(dIn > 0 && dOut > 0 && dOut <= dIn,
      s"jlProject needs 0 < dOut <= dIn, got dIn=$dIn dOut=$dOut")
    // column j of the sign matrix as a literal array, one per output dim
    val signCols = (0 until dOut).map { j =>
      typedlit((0 until dIn).map(i => sign(seed, i, j)))
    }
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    array(signCols.map { s =>
      aggregate(
        zip_with(vec, s, (x, sgn) => x.cast("double") * sgn),
        lit(0.0), (acc, t) => acc + t) * lit(scale)
    }: _*)
  }

  /** (idCol, j, p): the projected coordinates in long format, rounded to
    * 6 decimals for engine-portable comparison. Rows whose vector is not
    * exactly dIn long are rejected loudly (a silent zip_with null-pad
    * would corrupt the projection). */
  def jlProject(df: DataFrame, dIn: Int, dOut: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", seed: String = "jl"): DataFrame = {
    val checked = df.withColumn("__n", size(col(vecCol)))
    val proj = checked.select(col(idCol),
      when(col("__n") === dIn, jlProjectVec(col(vecCol), dIn, dOut, seed))
        .otherwise(raise_error(concat(lit(s"jlProject: expected $dIn-dim vector, got "),
          col("__n").cast("string")))).as("__p"))
    proj.select(col(idCol), posexplode(col("__p")).as(Seq("j", "p")))
      .select(col(idCol), col("j"), round(col("p"), 6).as("p"))
  }
}
