package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 experiment: what Partitioning does a (severed) localCheckpoint
  * leaf actually report under AQE, and does the next round's join on the
  * same key reuse it (skip the Exchange) or re-shuffle?
  *
  * Context: VERDICT r11 item 4 claims the per-round components join
  * re-exchanges BOTH sides every round because "CheckpointBridge
  * preserves stats only". This prints the ground truth.
  */
object CkPartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.reasoner.Reasoner.RoundCheckpointOps

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 48)
      .select((col("l_orderkey") * 4).as("v"), (col("l_partkey") * 4 + 1).as("u"))

    def leafInfo(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          println(s"[$tag] leaf partitioning = ${lr.outputPartitioning}")
          println(s"[$tag] leaf ordering     = ${lr.outputOrdering}")
          println(s"[$tag] rdd partitions    = ${lr.rdd.getNumPartitions}")
        case other => println(s"[$tag] NOT a LogicalRDD leaf: ${other.getClass}")
      }
    }

    // 1. plain localCheckpoint after keyed repartition
    val ck1 = li.repartition(col("u")).localCheckpoint()
    leafInfo("plain", ck1)
    // 2. severed variant (the fixpoint loops' form)
    val ck2 = li.repartition(col("u")).localCheckpointSevered()
    leafInfo("severed", ck2)
    // 3. numbered repartition (no AQE coalescing of the keyed exchange)
    val ck3 = li.repartition(32, col("u")).localCheckpointSevered()
    leafInfo("severed-32", ck3)

    // does a join keyed on u reuse the checkpoint's partitioning?
    val lbl = li.groupBy("v").agg(min(col("u")).as("lbl"))
      .select(col("v").as("u"), col("lbl"))
    def exchanges(tag: String, und: org.apache.spark.sql.DataFrame): Unit = {
      val j = und.join(lbl, "u").groupBy("v").agg(min(col("lbl")))
      val plan = j.queryExecution.executedPlan.toString
      val n = "(?m)^.*Exchange".r.findAllIn(plan).size
      println(s"[$tag] join-plan Exchange count = $n")
      j.collect()
      println(s"[$tag] final plan:\n" + j.queryExecution.executedPlan.toString.linesIterator.map("    " + _).mkString("\n"))
    }
    exchanges("plain", ck1)
    exchanges("severed-32", ck3)

    // forced-SMJ scenario (the 100 TB shape: |V| no longer broadcasts):
    // does the stamped leaf partitioning save the big side's Exchange?
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j32 = ck3.join(lbl, "u").groupBy("v").agg(min(col("lbl")))
    j32.collect()
    val plan32 = j32.queryExecution.executedPlan.toString
    println(s"[severed-32, no-broadcast] Exchange count = " +
      "(?m)Exchange hashpartitioning".r.findAllIn(plan32).size)
    println(plan32.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("ExistingRDD"))
      .map("    " + _).mkString("\n"))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // the fused checkpoint+count helper must stamp the same layout
    val (ck4, n4) = org.apache.spark.sql.graft.CheckpointBridge
      .localCheckpointSeveredCounted(li.repartition(32, col("u")))
    leafInfo("fused-32", ck4)
    println(s"[fused-32] count = $n4 vs df.count = ${li.count()}")
    spark.stop()
  }
}
