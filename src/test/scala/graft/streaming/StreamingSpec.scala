package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live Structured Streaming semantics + R2S exact emission sequences,
  * mirroring `kolibrie/tests/rsp_engine_test.rs:10-160`. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("streaming windowed aggregation equals batch window semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val input = mem.toDF().toDF("secs", "etype")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val agg = input
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "3 seconds", "1 second"), col("etype"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("wstart"), col("etype"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("winagg")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData((1L, "a"), (2L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((10L, "a")) // advances watermark, closing earlier windows
      q.processAllAvailable()
      val got = spark.table("winagg")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // batch equivalent over the same rows (only closed windows emitted)
      val batch = Seq((1L, "a"), (2L, "a"), (2L, "b")).toDF("secs", "etype")
        .withColumn("ts", timestamp_seconds(col("secs")))
        .groupBy(window(col("ts"), "3 seconds", "1 second"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("wstart"), col("etype"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(batch.subsetOf(got ++ batch.filter(_._1 > 7)))
      assert(got.nonEmpty && got.forall(batch.contains))
    } finally q.stop()
  }

  test("ISTREAM walkthrough: RANGE 3 STEP 1 emits newly-visible items (rsp_engine_test.rs:10-103)") {
    // subjects arriving at t=0..4, distinct per tick
    val events = (0 to 4).map(i => (i.toLong, s"subject$i")).toDF("secs", "v")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val rel = StreamOps.windowRelation(events, "ts", "3 seconds", "1 second", Seq("v"))
    val ist = StreamOps.istream(rel, "1 second")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every subject appears as newly-visible somewhere, exactly once: the
    // first window covering it (one new appearance per subject = 5 total)
    assert(ist.values.flatten.toSet == (0 to 4).map(i => s"subject$i").toSet)
    assert(ist.values.map(_.size).sum == 5)
    // istream rows are a subset of the relation sequence itself
    val relSet = rel.collect().map(r => (r.getString(0), r.getString(1))).toSet
    ist.foreach { case (w, vs) => vs.foreach(v => assert(relSet.contains((w, v)))) }
  }

  test("live interval join agrees with the batch formulation and spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Long)] // (id, key, secs)
    val rMem = MemoryStream[(Long, String, Long)]
    val l = lMem.toDF().toDF("lid", "k", "secs")
      .withColumn("lts", timestamp_seconds(col("secs"))).drop("secs")
    val r = rMem.toDF().toDF("rid", "k", "secs")
      .withColumn("rts", timestamp_seconds(col("secs"))).drop("secs")
    val joined = graft.pipeline.EventOps.intervalJoinStream(
      // delay 10 s: batch-2 rows at t=11 s must not be late vs the
      // batch-1 watermark (inner-join emission itself never waits)
      l, r, Seq("k"), "lts", "rts", loMs = -2000L, hiMs = 2000L,
      watermark = "10 seconds", rightPayload = Seq("rid"))
      .select("lid", "matched_rid")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivjoin")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // matches within one batch AND across batches (state carries rows)
      lMem.addData((1L, "u", 10L), (2L, "u", 100L))
      rMem.addData((10L, "u", 9L), (11L, "u", 12L), (12L, "v", 10L))
      q.processAllAvailable()
      rMem.addData((13L, "u", 101L)) // joins the batch-1 left row
      lMem.addData((3L, "u", 11L))   // joins batch-1 right rows
      q.processAllAvailable()
      val got = spark.table("ivjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch ground truth via the bucket-blocked formulation on epoch-ms
      val lb = Seq((1L, "u", 10000L), (2L, "u", 100000L), (3L, "u", 11000L))
        .toDF("lid", "k", "tms")
      val rb = Seq((10L, "u", 9000L), (11L, "u", 12000L), (12L, "v", 10000L),
        (13L, "u", 101000L)).toDF("rid", "k", "tms")
      val ref = graft.pipeline.EventOps.intervalJoin(lb, rb, Seq("k"),
          "tms", "tms", -2000L, 2000L, Seq("rid"))
        .select("lid", "matched_rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref, s"live $got vs batch $ref")
      assert(got.contains((2L, 13L)) && got.contains((3L, 11L)),
        "cross-batch matches missing")
    } finally q.stop()
  }

  test("DSTREAM reports deletions at the following firing (r2s.rs:40-52)") {
    val events = Seq((0L, "x"), (1L, "x"), (5L, "y")).toDF("secs", "v")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val rel = StreamOps.windowRelation(events, "ts", "2 seconds", "1 second", Seq("v"))
    val dst = StreamOps.dstream(rel, "1 second")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // x lives in windows starting -1,0,1 (covering ts 0,1); deleted at window start 2
    // but window 2 is not a firing in rel (no events) → deletion reported at
    // the next existing firing only if that window exists; windows for y are 4,5
    assert(!dst.exists(_._2 == "y") || dst.exists(_._2 == "x"))
    // rstream is identity
    assert(StreamOps.rstream(rel).collect().length == rel.collect().length)
  }

  test("streaming exact dedup: first arrival survives, state expires, batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("tms", "doc_id", "text")
      .withColumn("ts", timestamp_millis(col("tms")))
    val dedup = Dedup.streamingExactDedup(stream, "ts", "10 seconds")
    val sink = s"sdedup_${System.nanoTime()}"
    val sq = dedup.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    // doc 2 duplicates doc 1 from a LATER micro-batch within the horizon
    // (dropped); doc 98 advances the watermark past doc 1's state expiry
    // so doc 4's much-later duplicate SURVIVES (the standing-corpus
    // catch is incrementalExactDedup's job); null-text docs are never
    // deduped against each other
    // base offset keeps event times strictly above the initial watermark
    // (a ts-0 row is dropped as late before any state exists)
    val base = 1000000L
    val batches = Seq(
      Seq((base + 0L, 1L, "alpha beta"), (base + 200L, 3L, "gamma")),
      Seq((base + 300L, 2L, "alpha beta"), (base + 500L, 5L, null: String),
        (base + 600L, 6L, null: String)),
      Seq((base + 50000L, 98L, "advance")),
      Seq((base + 100000L, 4L, "alpha beta")),
      Seq((base + 300000L, 99L, "sentinel")))
    try {
      batches.foreach { b => mem.addData(b); sq.processAllAvailable() }
      val kept = spark.table(sink).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 5L, 6L, 98L, 4L, 99L), s"kept $kept")
      // batch leg over the first horizon's rows agrees on the survivor set
      import spark.implicits._
      val batchKept = Dedup.exactDedup(
          batches.take(2).flatten.toDF("tms", "doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(batchKept == Set(1L, 3L, 5L, 6L), s"batch $batchKept")
    } finally sq.stop()
  }

  test("session_window streaming leg merges across micro-batches, equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("tms", "user_id", "value")
      .withColumn("ts", timestamp_millis(col("tms")))
      .withWatermark("ts", "0 seconds")
    val agg = StreamOps.sessionWindowAgg(stream, "ts", "10 seconds",
      Seq("user_id"), Seq(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv")))
    val sink = s"session_win_${System.nanoTime()}"
    val sq = agg.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    // user 1: one session spanning batches (0 s, 5 s, 9 s), then a new
    // session at 60 s; user-99 sentinels only advance the watermark
    val batches = Seq(
      Seq((0L, 1L, 1.0), (5000L, 1L, 2.0)),
      Seq((9000L, 1L, 3.0), (60000L, 1L, 4.0)),
      Seq((1000000L, 99L, 0.0)),
      Seq((2000000L, 99L, 0.0)))
    try {
      batches.foreach { b => mem.addData(b); sq.processAllAvailable() }
      val got = spark.table(sink)
        .filter(col("user_id") === 1L)
        .select("user_id", "n", "sv", "sstart", "send")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4))).toSet
      // the 0/5/9 s events are ONE session even though they straddle a
      // micro-batch boundary: [0, 19000); the 60 s event is its own
      assert(got == Set(
        (1L, 3L, 6.0, 0L, 19000L),
        (1L, 1L, 4.0, 60000L, 70000L)), s"streaming sessions: $got")
      // batch leg over the same rows produces the identical relation
      import spark.implicits._
      val batchDf = batches.flatten.toDF("tms", "user_id", "value")
        .withColumn("ts", timestamp_millis(col("tms")))
      val batchGot = StreamOps.sessionWindowAgg(batchDf, "ts", "10 seconds",
        Seq("user_id"), Seq(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv")))
        .filter(col("user_id") === 1L)
        .select("user_id", "n", "sv", "sstart", "send")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(batchGot == got, s"batch $batchGot != streaming $got")
    } finally sq.stop()
  }

  test("streaming minhash-lsh pairs equal uncapped batch pairs; horizon prunes") {
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("tms", "doc_id", "text")
      .withColumn("ts", timestamp_millis(col("tms")))
    val pairs = Dedup.streamingMinHashPairs(stream, "ts", "10 seconds",
      k = 2, numHashes = 32, bands = 8, threshold = 0.5)
    val sink = s"smh_${System.nanoTime()}"
    val sq = pairs.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val base = 1000000L
    val t1 = "the quick brown fox jumps over the lazy dog"
    val t2 = "the quick brown fox jumps over the lazy cat"
    val t3 = "the quick brown fox jumps over the lazy dog again"
    // 1/2 near-dup in ONE micro-batch, 3 near-dups them from a LATER
    // batch inside the horizon, 9 unrelated; 50 advances the watermark;
    // 4 repeats doc 1's text AFTER the horizon → its stored peers are
    // pruned at arrival, no pair
    val batches = Seq(
      Seq((base + 0L, 1L, t1), (base + 100L, 2L, t2),
        (base + 200L, 9L, "completely different words entirely unrelated here")),
      Seq((base + 300L, 3L, t3)),
      Seq((base + 60000L, 50L, "advance the watermark far beyond them all")),
      Seq((base + 70000L, 4L, t1)),
      Seq((base + 300000L, 51L, "sentinel text to flush everything out")))
    try {
      batches.foreach { b => mem.addData(b); sq.processAllAvailable() }
      val got = spark.table(sink).select("id_a", "id_b", "est_jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch leg over the in-horizon docs, uncapped (the streaming
      // multi-band multiplicity collapses under toSet)
      val batchPairs = Dedup.minHashLshPairs(
          batches.take(2).flatten.toDF("tms", "doc_id", "text"),
          k = 2, numHashes = 32, bands = 8, threshold = 0.5,
          maxBucketSize = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batchPairs.nonEmpty, "batch leg found no pairs — test is vacuous")
      assert(got == batchPairs, s"stream $got != batch $batchPairs")
      assert(!got.exists(p => p._2 == 4L),
        s"doc 4 arrived after the horizon and must not pair: $got")
    } finally sq.stop()
  }
}
