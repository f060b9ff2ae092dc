package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Stage-decomposition probe for [[Similarity.ivfPqTopK]]'s 1× constant
  * (the entry is sublinear across both probe decades — e₁ 0.42 /
  * e₂ 0.36 — but its sf0.1 steady state started at ~6.6 s, mostly
  * fixed overhead; this prints where). */
object IvfPqBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm full") { Similarity.ivfPqTopK(e, q, 5, 8, 3).count() }
    t("kmeansMicro k=8 ckpt") { Similarity.kmeansMicro(e, 8, 2).count() }
    t("kmeansMicro k=16 ckpt") { Similarity.kmeansMicro(e, 16, 2).count() }
    t("full ivfPqTopK") { Similarity.ivfPqTopK(e, q, 5, 8, 3).count() }
    t("full again") { Similarity.ivfPqTopK(e, q, 5, 8, 3).count() }
    spark.stop()
  }
}

/** kmeansMicro internals: where the ~2-3 s 1× constant goes. */
object KmeansBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm") { Similarity.kmeansMicro(e, 8, 2).count() }
    (1 to 3).foreach { i =>
      t(s"kmeansMicro k=8 rep$i") { Similarity.kmeansMicro(e, 8, 2).count() }
    }
    import org.apache.spark.sql.types.LongType
    val x = t("x explode+checkpoint") {
      e.select(col("vec_id").as("id"),
        posexplode(transform(col("embedding"),
          v => floor(v.cast("double") * lit(1000000.0)).cast(LongType)))
          .as(Seq("pos", "xq"))).localCheckpoint()
    }
    t("one assignment round (agg only)") {
      val cent = x.limit(512).select(lit(0).as("cid"), col("pos"), col("xq").as("cq"))
      x.join(broadcast(cent), "pos")
        .groupBy("id", "cid")
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
        .groupBy("id")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid")).count()
    }
    spark.stop()
  }
}

/** Prints the realized partition count of connectedComponents' undirected
  * table across repeated constructions (AQE may coalesce the keyed
  * repartition differently per run — the suspected source of the
  * bimodal per-session graph_components wall). */
object UndPartsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // same construction as the graph_components entry's edge table
    val co = li.filter(col("l_quantity") > 48).select((col("l_orderkey") * 4).as("src"), (col("l_partkey") * 4 + 1).as("dst"))
    (1 to 3).foreach { i =>
      val fwd = co.select(col("src").as("v"), col("dst").as("u"))
        .filter(col("v").isNotNull && col("u").isNotNull && col("v") =!= col("u"))
      val und = fwd.unionByName(fwd.select(col("u").as("v"), col("v").as("u")))
        .distinct().repartition(col("u")).localCheckpoint()
      println(s"[undparts] run $i: ${und.rdd.getNumPartitions} partitions, ${und.count()} rows")
    }
    spark.stop()
  }
}
