package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** THE single reader for `events.parquet` — every consumer (StreamSuite,
  * DistributedRspSpec, Sf1Probe) goes through here so a testdata schema
  * drift breaks exactly one function with one clear message.
  *
  * History: the driver-generated events table has carried `ts` as
  * TIMESTAMP(NANOS) (which Spark 4 only reads as `long` under
  * `spark.sql.legacy.parquet.nanosAsLong`) and as `timestamp[us]` (read as
  * TIMESTAMP_NTZ) in different rounds. Round 5 lost its entire streaming
  * surface to exactly this drift — six copies of a reader that assumed
  * nanos-as-long all threw `DATATYPE_MISMATCH` when the data moved to
  * microseconds. This reader branches on the ACTUAL schema instead.
  */
object EventsReader {

  /** events with `ts` normalized to session-TZ TimestampType (the session
    * runs UTC), whatever physical type the parquet carries. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // only flip the legacy flag when the file ACTUALLY carries
    // TIMESTAMP(NANOS) (Spark refuses to load it otherwise) — setting it
    // unconditionally changed how every later parquet read in the shared
    // session interprets nanos columns (review finding). When the flag is
    // needed it stays set for the session: it must still hold at
    // execution time for this DataFrame's scans.
    val df =
      try s.read.parquet(path)
      catch { case e: Exception
          if String.valueOf(e.getMessage).contains("TIMESTAMP(NANOS") ||
            Option(e.getCause).exists(c =>
              String.valueOf(c.getMessage).contains("TIMESTAMP(NANOS")) =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as epoch-ns long; integer
        // division — double division at ns-epoch magnitude loses precision
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.parquet ts column has unsupported type $other — " +
          "extend graft.streaming.EventsReader for the new testdata schema")
    }
  }

  /** events plus an exact epoch-ms `tms` long column — the RSP plane's
    * native time axis (close boundaries are ms arithmetic). */
  def eventsMs(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("tms", unix_millis(col("ts")))
}
