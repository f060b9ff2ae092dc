package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity}

/** One-off probe for the xxhash64↔portable twin agreement (VERDICT r9
  * item 3): does the xxhash64 MinHash-LSH verified pair SET equal the
  * md5-portable one, and does the float-IVF top-k set equal the exact
  * brute-force top-k, on the driver testdata? If yes (deterministic
  * corpora, fixed seeds), the agreement is stable round over round and
  * can carry a DuckDB oracle; if no, the divergence is printed so the
  * entry design can respond to facts instead of hope. */
object AgreementProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("agreement-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)

    val xx = Dedup.minHashLshPairs(docs, k = 3, numHashes = 32, bands = 8,
      threshold = 0.5, checkpointSigs = true).select("id_a", "id_b")
    val port = Dedup.minHashLshPairs(docs, k = 3, numHashes = 32, bands = 8,
      threshold = 0.5, checkpointSigs = true, portableHashes = true)
      .select("id_a", "id_b")
    val onlyXx = xx.exceptAll(port).count()
    val onlyPort = port.exceptAll(xx).count()
    println(s"[agree] minhash: xx=${xx.count()} portable=${port.count()} " +
      s"onlyXx=$onlyXx onlyPortable=$onlyPort")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(e, q, k = 5, nClusters = 16, nProbe = 4,
      checkpointCentroids = true).select("qid", "nid")
    val exact = Similarity.bruteForceTopK(e, q, k = 5).select("qid", "nid")
    val onlyIvf = ivf.exceptAll(exact).count()
    val onlyExact = exact.exceptAll(ivf).count()
    println(s"[agree] ivf: ivf=${ivf.count()} exact=${exact.count()} " +
      s"onlyIvf=$onlyIvf onlyExact=$onlyExact")

    val ivfPort = Similarity.ivfTopKPortable(e, q, k = 5, nClusters = 16,
      nProbe = 4).select("qid", "nid")
    val dXp = ivf.exceptAll(ivfPort).count()
    val dPx = ivfPort.exceptAll(ivf).count()
    println(s"[agree] ivf-vs-portable: onlyFloat=$dXp onlyPortable=$dPx")
    spark.stop()
  }
}
