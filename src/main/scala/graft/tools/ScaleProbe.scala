package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity}

/** Scale probe for the documented lazy-subplan trade-offs (VERDICT r3
  * item 10): replicate the provided corpus ~N× with deterministic
  * perturbation, then measure lazy-recompute vs checkpoint for the
  * MinHash signature table and the IVF centroid chain. Not part of the
  * driver contract — a measurement harness; results recorded in the
  * operators' Scaladoc and SURVEY.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ×factor documents: per-copy deterministic word shuffle keeps shingle
    // cardinality and length distribution without creating cross-copy
    // near-duplicate explosions
    val shuffleWords = udf((text: String, seed: Long) => {
      val words = text.split(" ").toSeq
      new scala.util.Random(seed).shuffle(words).mkString(" ")
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scaledDocs = (0 until factor).map { c =>
      docs.select((col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        shuffleWords(col("text"), col("doc_id") + lit(c * 7919)).as("text"))
    }.reduce(_ unionByName _).repartition(32)
    println(s"[scale-probe] documents: ${scaledDocs.count()} rows (${factor}x)")

    time("minhash-lsh LAZY")(
      Dedup.minHashLshPairs(scaledDocs).count())
    time("minhash-lsh CHECKPOINT")(
      Dedup.minHashLshPairs(scaledDocs, checkpointSigs = true).count())
    time("minhash-lsh LAZY (2nd)")(
      Dedup.minHashLshPairs(scaledDocs).count())
    time("minhash-lsh CHECKPOINT (2nd)")(
      Dedup.minHashLshPairs(scaledDocs, checkpointSigs = true).count())

    // ×factor embeddings: per-copy deterministic element jitter
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val scaledEmb = (0 until factor).map { c =>
      emb.select((col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + (pmod(xxhash64(col("vec_id") + lit(c), i), lit(1000)).cast("double")
            - 500.0) / 50000.0).as("embedding"))
    }.reduce(_ unionByName _).repartition(32)
    println(s"[scale-probe] embeddings: ${scaledEmb.count()} rows (${factor}x)")
    val queries = scaledEmb.filter(col("vec_id") < 10)

    time("ivf-topk LAZY")(
      Similarity.ivfTopK(scaledEmb, queries, k = 5, nClusters = 16, nProbe = 4)
        .count())
    time("ivf-topk CHECKPOINT")(
      Similarity.ivfTopK(scaledEmb, queries, k = 5, nClusters = 16, nProbe = 4,
        checkpointCentroids = true).count())
    time("ivf-topk LAZY (2nd)")(
      Similarity.ivfTopK(scaledEmb, queries, k = 5, nClusters = 16, nProbe = 4)
        .count())
    time("ivf-topk CHECKPOINT (2nd)")(
      Similarity.ivfTopK(scaledEmb, queries, k = 5, nClusters = 16, nProbe = 4,
        checkpointCentroids = true).count())
    spark.stop()
  }
}
