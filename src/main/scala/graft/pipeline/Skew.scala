package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key joins and aggregations.
  *
  * AQE's runtime skew-join splitting covers sort-merge joins, but two
  * shapes still need explicit salting at 100 TB:
  *  - aggregations over power-law keys (one reducer owns the hot key)
  *  - joins of a skewed fact side against a small-but-not-broadcastable
  *    dimension
  *
  * Salting is deterministic here (hash of a tiebreak column, not rand())
  * so results are reproducible and retries are safe.
  */
object Skew {

  /** Two-phase aggregation over skewed keys: partial-aggregate on
    * (key, salt) then final-aggregate on key. `partial` must be an
    * algebraic aggregate with a matching `merge` (e.g. sum/sum,
    * count/sum, max/max). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltCol: Column,
      buckets: Int, partial: Column, merge: Column => Column,
      as: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltCol), lit(buckets)))
    salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partial.as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(merge(col("__partial")).as(as))
  }

  /** Salted equi-join: the skewed left side gets a deterministic salt in
    * [0, buckets); the right side is replicated `buckets` times with an
    * explode — the classic salt-and-replicate pattern for a hot-keyed
    * fact ⋈ medium dimension. Inner joins only. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltCol: Column, buckets: Int): DataFrame = {
    val left = skewed.withColumn("__salt", pmod(hash(saltCol), lit(buckets)))
    val right = other.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    left.join(right, keys :+ "__salt", "inner").drop("__salt")
  }
}
