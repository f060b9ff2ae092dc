package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based differential oracle for the incremental R2S operators:
  * for random (close, key) relation sequences — with gaps, reappearance,
  * duplicate keys per close, and multi-batch replay at arbitrary chunk
  * boundaries — the transformWithState ISTREAM/DSTREAM must equal the
  * batch step-arithmetic formulations (DSTREAM compared on fired closes,
  * the batch op's extra gate). Deterministic seeds; each sample runs a
  * real streaming query, so the sample count is small. */
class IncrementalR2SPropertySpec extends SparkSpec {
  import spark.implicits._
  import DistributedRsp.R2SRow

  private val step = 10L

  /** Random relation: subset of closes {10..80} × keys {k0..k3}. */
  private val relGen: Gen[List[(Long, String)]] = Gen.listOf(for {
    c <- Gen.choose(1, 8)
    k <- Gen.oneOf("k0", "k1", "k2", "k3")
  } yield (c * step, k)).map(_.distinct)

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def runIncremental(rows: Seq[(Long, String)], chunkSize: Int,
      dstream: Boolean, buffered: Boolean = false,
      shuffleSeed: Option[Long] = None): Set[(Long, String)] = withRocksDb {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val maxClose = rows.map(_._1).max
    // the buffered family tolerates any order the watermark admits: feed
    // SHUFFLED with a lateness allowance covering the whole span, and push
    // the final watermark far enough that every buffered close + deletion
    // timer drains
    val delayMs = if (shuffleSeed.isDefined) maxClose + step else 0L
    val ordered = shuffleSeed match {
      case Some(sd) => new scala.util.Random(sd).shuffle(rows.toVector).toSeq
      case None => rows.sortBy(_._1)
    }
    val chunks = ordered.grouped(chunkSize).toSeq :+
      Seq((maxClose + delayMs + 3 * step, "__sentinel"))
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDF().toDF("close", "k")
      .withColumn("ts", timestamp_millis(col("close")))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[(Long, String, java.sql.Timestamp)]
      .map { case (c, k, _) => R2SRow(c, Map("k" -> k)) }
    val out = (dstream, buffered) match {
      case (true, false) => IncrementalR2S.dstream(in, step)
      case (false, false) => IncrementalR2S.istream(in, step)
      case (true, true) => IncrementalR2S.dstreamBuffered(in, step)
      case (false, true) => IncrementalR2S.istreamBuffered(in, step)
    }
    val sink = s"r2s_prop_${System.nanoTime()}"
    val sq = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      chunks.foreach { ch => mem.addData(ch); sq.processAllAvailable() }
      spark.table(sink).collect()
        .map(r => (r.getAs[Long]("close"),
          r.getAs[Map[String, String]]("binding")("k")))
        .filterNot(_._2 == "__sentinel").toSet
    } finally sq.stop()
  }

  test("incremental ISTREAM/DSTREAM == batch diffs on random feeds") {
    val seeds = Seq(11L, 23L, 47L)
    seeds.foreach { sd =>
      val rows = relGen(Gen.Parameters.default, Seed(sd))
        .filter(_.nonEmpty).getOrElse(List((10L, "k0"), (30L, "k0")))
      val rel = rows.toDF("close", "k").distinct()
      val batchI = rel.join(rel.withColumn("close", col("close") + step),
          Seq("close", "k"), "left_anti")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val firings = rows.map(_._1).toSet
      val batchD = rel.withColumn("close", col("close") + step)
        .join(rel, Seq("close", "k"), "left_anti")
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .filter(kv => firings.contains(kv._1)).toSet
      Seq(1, 3, 100).foreach { chunk =>
        val incI = runIncremental(rows, chunk, dstream = false)
        assert(incI == batchI,
          s"seed=$sd chunk=$chunk istream: extra=${incI -- batchI}, missing=${batchI -- incI}, rows=$rows")
        val incD = runIncremental(rows, chunk, dstream = true)
          .filter(kv => firings.contains(kv._1))
        assert(incD == batchD,
          s"seed=$sd chunk=$chunk dstream: extra=${incD -- batchD}, missing=${batchD -- incD}, rows=$rows")
      }
      // the BUFFERED family must produce the same diffs from a feed
      // SHUFFLED across micro-batches (the eager family's close-monotone
      // delivery contract, lifted): ListState + event-time timers drain
      // each key's closes in close order once the watermark passes
      Seq(2, 7).foreach { chunk =>
        val incI = runIncremental(rows, chunk, dstream = false,
          buffered = true, shuffleSeed = Some(sd * 31 + chunk))
        assert(incI == batchI,
          s"seed=$sd chunk=$chunk buffered istream (shuffled): " +
            s"extra=${incI -- batchI}, missing=${batchI -- incI}, rows=$rows")
        val incD = runIncremental(rows, chunk, dstream = true,
          buffered = true, shuffleSeed = Some(sd * 37 + chunk))
          .filter(kv => firings.contains(kv._1))
        assert(incD == batchD,
          s"seed=$sd chunk=$chunk buffered dstream (shuffled): " +
            s"extra=${incD -- batchD}, missing=${batchD -- incD}, rows=$rows")
      }
    }
  }
}
