package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint` that does NOT carry the origin plan's statistics or
  * constraints into the checkpointed leaf — it reports the checkpoint's
  * MEASURED block size instead.
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
  * range` soon after.
  *
  * Severing to NO stats (the r7 form) traded that explosion for a
  * planning regression: the leaf reported `defaultSizeInBytes`, so
  * Catalyst stopped broadcasting the node/label-sized relations these
  * loops join every round — measured r6→r7 creep across the whole
  * checkpoint-loop family (graph_components 3.26 → 4.15 s,
  * prob_sdd_wmc 1.73 → 2.26 s; VERDICT r7 item 2). The loops that hint
  * broadcasts explicitly (semi-naive delta) didn't care, but the
  * doubling closures and the graph loops rely on the planner.
  *
  * The fix is free: `localCheckpoint()` is EAGER, so by the time the
  * leaf is rebuilt the blocks are materialized and the block manager
  * knows their exact byte size. That measurement goes in as the leaf's
  * stats — a CONSTANT per round (no multiplication chain, bit length
  * bounded by the real data), and an honest broadcast signal. A
  * partition that spilled reports mem + disk bytes. If storage info is
  * unavailable (no blocks yet for a LAZY checkpoint, or the RDD was
  * evicted) the leaf stays statless, which is the conservative r7
  * behavior.
  *
  * The rebuilt leaf shares the SAME materialized partitions and output
  * attribute ids as the plain checkpoint — only the second (curried)
  * constructor argument list changes, no data moves. */
object CheckpointBridge {
  /** A/B escape hatch for the measured-stats leaf (−Dgraft.checkpoint
    * .measuredStats=false reverts to the statless r7 severing). */
  private def measuredStatsEnabled: Boolean =
    !"false".equalsIgnoreCase(System.getProperty("graft.checkpoint.measuredStats", "true"))

  def localCheckpointSevered(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val cs = ck.sparkSession.asInstanceOf[ClassicSession]
        val measured = if (!measuredStatsEnabled) None else
          cs.sparkContext.getRDDStorageInfo(_.id == lr.rdd.id)
          .headOption
          .map(i => i.memSize + i.diskSize)
          .filter(_ > 0L)
          .map(b => Statistics(sizeInBytes = BigInt(b)))
        Dataset.ofRows(cs, new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(cs, measured, None))
      case _ => ck
    }
  }
}
