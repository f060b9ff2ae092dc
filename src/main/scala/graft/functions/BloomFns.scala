package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit}

/** Session registration for Spark's OWN bloom-filter expressions —
  * `BloomFilterAggregate` (build a compact bloom sketch over a key
  * column) and `BloomFilterMightContain` (probe it). Spark uses these
  * internally for runtime row-level join filtering but does not expose
  * them in the SQL function registry; this registers them under
  * `graft_bloom_agg` / `graft_might_contain` (the [[HllDistinct]]
  * registration pattern) so library code can build EXPLICIT runtime
  * filters: fold the small side's join keys into one KB–MB binary
  * sketch, broadcast it as a one-row cross join, and drop probe rows
  * whose key the bloom has never seen BEFORE they reach the shuffle.
  * False positives pass and are eliminated by the exact join behind the
  * filter — results stay exact, only the pruning rate is probabilistic. */
object BloomFns {

  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
    case other =>
      throw new IllegalArgumentException(
        s"graft_bloom_agg expects (child, estimatedItems, numBits), got ${other.length} args")
  }

  private val probeBuilder: Seq[Expression] => Expression = {
    case Seq(bloom, value) => new BloomFilterMightContain(bloom, value)
    case other =>
      throw new IllegalArgumentException(
        s"graft_might_contain expects (bloom, value), got ${other.length} args")
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", aggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", probeBuilder, "built-in")
  }

  /** Aggregate a long key column into a bloom-filter sketch (binary). */
  def bloomAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", key, lit(estimatedItems), lit(numBits))

  /** True if the bloom sketch may contain `key` (no false negatives). */
  def mightContain(bloom: Column, key: Column): Column =
    call_function("graft_might_contain", bloom, key)
}
