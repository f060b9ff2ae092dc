package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning (beyond-reference
  * surface, SURVEY §7.1.8): Z-ORDER (Morton-curve) clustering maps two
  * scan dimensions onto one sort key whose ranges are small rectangles
  * in (x, y) space — so parquet min/max file statistics prune selective
  * predicates on EITHER dimension, not just the leading sort column.
  * This is the standard open-table-format answer (Delta/Iceberg
  * `ZORDER BY`/`sort_order`) to "we filter 100 TB by both user and
  * time": a linear sort clusters one dimension and shreds the other;
  * the z-curve keeps both locally dense.
  *
  * The z-value itself is pure per-row integer arithmetic — a statically
  * unrolled bit interleave, whole-stage-codegen'd, exchange-free, and
  * closed-form reproducible in ANSI SQL, so the mapping hash-checks
  * against the DuckDB oracle. The write path is one
  * `repartitionByRange` (Spark samples range bounds — the only shuffle)
  * followed by a partition-local sort: files come out tiling the curve.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * integer columns — x on even bit positions, y on odd. Statically
    * unrolled (bits is plan-time), so every term is a shift by a
    * literal: codegen-friendly, no lambda HOF. Inputs are masked to
    * `bits` bits (callers bucketize wider domains first — rank,
    * hash, or scale — exactly like table-format OPTIMIZE does). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Cluster `df` along the z-curve of two dimension columns: range
    * partition on the z-value (one shuffle, sampled bounds) + sort
    * within partitions. Write the result and each output file covers a
    * compact z-range = a small (x, y) rectangle, so min/max stats prune
    * point/range predicates on either dimension. */
  def zorderBy(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val z = zValue(x, y, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
