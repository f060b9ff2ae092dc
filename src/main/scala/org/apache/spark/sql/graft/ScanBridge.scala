package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** One-job driver-merged aggregation over a DataFrame's rows (r12).
  *
  * The portable k-means family's Lloyd rounds aggregate a corpus scan
  * down to MODEL-sized state (k·dim sums + k counts). The SQL form pays,
  * per round: a posexplode into n·dim rows, a hash aggregation keyed by
  * (cid, pos), an Exchange of the k·dim partials, a final aggregation,
  * and a collect — with AQE materializing each exchange as its own job.
  * The aggregation itself is a dense fixed-shape array fold, so this
  * helper runs it as ONE `runJob` over the executed plan's rows: the
  * per-row heavy math (distance argmin, quantization) stays in
  * whole-stage codegen inside `df`'s projection; the fold only indexes
  * into a per-task accumulator that `zero()` creates (one per task, so
  * mutable accumulators are safe), and the bounded per-partition results
  * merge on the driver — the treeAggregate shape ML training uses.
  * Exact integer arithmetic end-to-end keeps the result bit-identical to
  * the SQL aggregation on any partitioning.
  */
object ScanBridge {
  def aggregateRows[T: scala.reflect.ClassTag](df: DataFrame, zero: () => T,
      seqOp: (T, InternalRow) => T, combOp: (T, T) => T): T = {
    val cs = df.sparkSession.asInstanceOf[ClassicSession]
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd
    val z = zero; val sq = seqOp
    val perPartition = cs.sparkContext.runJob(rdd,
      (it: Iterator[InternalRow]) => {
        var acc = z()
        while (it.hasNext) acc = sq(acc, it.next())
        acc
      })
    perPartition.foldLeft(z())(combOp)
  }
}
