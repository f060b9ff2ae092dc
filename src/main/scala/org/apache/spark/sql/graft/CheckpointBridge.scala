package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint` that does NOT carry the origin plan's statistics or
  * constraints into the checkpointed leaf.
  *
  * Spark's `Dataset.localCheckpoint` builds a [[LogicalRDD]] with
  * `originStats`/`originConstraints` copied from the checkpointed plan
  * (so one checkpoint keeps good size estimates — desirable in straight-
  * line queries). Inside a FIXPOINT loop it is catastrophic: size-only
  * stats MULTIPLY across a join, the checkpoint freezes the product into
  * the next round's leaf, and the next round multiplies again — the
  * `sizeInBytes` BigInt roughly DOUBLES ITS BIT LENGTH every round.
  * Measured on the depth-100 linear deep-taxonomy probe: per-round wall
  * time 0.3 s at round 10 → 276 s at round 25 (the optimizer spends it
  * multiplying million-bit integers), and
  * `java.lang.ArithmeticException: BigInteger would overflow supported
  * range` soon after. The reasoner/graph loops were WRITTEN against the
  * documented pre-3.2 behavior (checkpoint leaves report
  * `defaultSizeInBytes`) and hint their broadcasts explicitly, so
  * severing restores exactly the contract they assume.
  *
  * The rebuilt leaf shares the SAME materialized partitions and output
  * attribute ids as the plain checkpoint — only the second (curried)
  * constructor argument list changes, no data moves. */
object CheckpointBridge {
  def localCheckpointSevered(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val cs = ck.sparkSession.asInstanceOf[ClassicSession]
        Dataset.ofRows(cs, new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(cs, None, None))
      case _ => ck
    }
  }
}
