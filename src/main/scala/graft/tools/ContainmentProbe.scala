package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage bisection for [[graft.pipeline.Dedup.containmentPairs]] on the
  * wide-vocab 100× corpus (WideVocabProbe measured e₂ = 1.72 there —
  * 224 s at 500K docs vs 4.3 s at 50K — while the kernel's design cost
  * is two narrow corpus scans + query-bounded joins, which should read
  * ~linear). Times each kernel stage separately so the superlinear term
  * gets a name instead of a guess. */
object ContainmentProbe {
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
      println(f"[cont-probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val probes = WideVocabProbe.snippets(spark, docs, 200)
    t("corpus count")(docs.count())

    val arrA = probes.select(col("probe_id").as("pid"),
        graft.functions.ShingleHashes.ofColumn(col("text"), 3).as("sha"))
      .filter(size(col("sha")) > 0).localCheckpoint()
    t("probe arrays (checkpointed)")(arrA.count())
    val arrB = docs.select(col("doc_id").as("id"),
        graft.functions.ShingleHashes.ofColumn(col("text"), 3).as("shb"))
      .filter(size(col("shb")) > 0)
    t("one corpus shingle scan")(arrB.count())

    val vocabRows = t("probe vocab distinct+collect")(
      arrA.select(explode(col("sha")).as("shh")).distinct()
        .limit(5000001).collect())
    val vocabA = spark.createDataFrame(
      java.util.Arrays.asList(vocabRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shh",
          org.apache.spark.sql.types.LongType, nullable = false))))

    val occBLazy = arrB.select(col("id"), explode(col("shb")).as("shh"))
      .join(broadcast(vocabA), Seq("shh"), "left_semi")
    val occB = occBLazy.localCheckpoint(eager = false)
    t("occB fill (lazy checkpoint)")(occB.count())
    t("occB re-read (cached?)")(occB.count())

    val dfB = occB.groupBy("shh").agg(count(lit(1)).as("df"))
    t("dfB")(dfB.count())

    val perProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("df").asc, col("shh").asc)
    val prefix = arrA
      .select(col("pid"), size(col("sha")).cast("long").as("n_sh"),
        explode(col("sha")).as("shh"))
      .join(dfB, Seq("shh"), "left_outer")
      .na.fill(0L, Seq("df"))
      .withColumn("pos", row_number().over(perProbe))
      .filter(col("pos") <= col("n_sh") - ceil(lit(0.9) * col("n_sh")) + 1)
      .select("pid", "shh")
    t("prefix rows")(prefix.count())
    val cand = prefix.join(occB, Seq("shh")).select("pid", "id").distinct()
    t("candidates")(cand.count())

    val full = cand.join(arrA.select(col("pid"), col("sha")), "pid")
      .join(arrB.select(col("id"), col("shb")), "id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .filter(col("inter").cast("double") >= lit(0.9) * size(col("sha")))
    t("verify (full op tail)")(full.count())

    println("[cont-probe] whole operator, as shipped:")
    t("containmentPairs end-to-end")(
      graft.pipeline.Dedup.containmentPairs(probes, docs, k = 3,
        threshold = 0.9).count())
    spark.stop()
  }
}
