package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Follow-up to [[ContainmentProbe]]: the 100× wall sits in the
  * occB explode+semi-join leg (351 s for a 97K-row result whose input
  * scan costs 6 s). This probe times the SAME leg under three plan
  * modes and prints the executed plan, to separate the checkpoint
  * mechanics from the join strategy from the scan itself. */
object ContainmentProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_widevocab_100x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cont2] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val probes = WideVocabProbe.snippets(spark, docs, 200)
    val arrA = probes.select(col("probe_id").as("pid"),
        graft.functions.ShingleHashes.ofColumn(col("text"), 3).as("sha"))
      .filter(size(col("sha")) > 0).localCheckpoint()
    val vocabRows = arrA.select(explode(col("sha")).as("shh")).distinct()
      .limit(5000001).collect()
    println(s"[cont2] vocab size ${vocabRows.length}")
    val vocabA = spark.createDataFrame(
      java.util.Arrays.asList(vocabRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shh",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val arrB = docs.select(col("doc_id").as("id"),
        graft.functions.ShingleHashes.ofColumn(col("text"), 3).as("shb"))
      .filter(size(col("shb")) > 0)
    t("corpus scan only")(arrB.count())
    val exploded = arrB.select(col("id"), explode(col("shb")).as("shh"))
    t("explode only")(exploded.count())
    val semi = exploded.join(broadcast(vocabA), Seq("shh"), "left_semi")
    t("explode+semi, no checkpoint")(semi.count())
    println(semi.queryExecution.executedPlan.toString.take(4000))
    t("explode+semi, second run")(semi.count())
    val eagerCp = t("eager localCheckpoint build")(
      semi.localCheckpoint())
    t("eager checkpoint count")(eagerCp.count())
    val lazyCp = semi.localCheckpoint(eager = false)
    t("lazy checkpoint count")(lazyCp.count())
    spark.stop()
  }
}
