package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata drift guard (VERDICT r5 item 4): round 5 lost its entire
  * streaming surface because `events.parquet` silently changed from
  * TIMESTAMP(NANOS) to `timestamp[us]` between rounds — 11 driver entries
  * crashed with cryptic analysis errors. This spec asserts the column
  * names and types of every testdata table at sf0.001, so the NEXT drift
  * fails here with the drifted column named.
  *
  * The events `ts` column is asserted ADAPTIVELY (long OR timestamp[_ntz])
  * because [[graft.streaming.EventsReader]] handles all three physical
  * encodings by design; everything else is exact.
  */
class SchemaContractSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // name -> expected Spark type; TimestampNTZType is what Spark 4 reads
  // for pandas-written timestamp[us] without timezone
  private def ts: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts),
    // ts adaptive: EventsReader supports nanos-as-long AND timestamp[_ntz]
    "events" -> Seq("event_id" -> Set(LongType), "ts" -> (ts + LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq("doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)))

  contract.foreach { case (table, cols) =>
    test(s"$table.parquet matches the schema contract") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      val actualNames = schema.fields.map(_.name).toSeq
      assert(actualNames == cols.map(_._1),
        s"$table columns drifted: expected ${cols.map(_._1)}, got $actualNames")
      cols.foreach { case (name, accepted) =>
        val actual = schema(name).dataType
        assert(accepted.contains(actual),
          s"$table.$name drifted to $actual (accepted: ${accepted.mkString(" | ")})")
      }
    }
  }

  test("EventsReader normalizes ts to TimestampType on the current testdata") {
    val df = graft.streaming.EventsReader.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    val ms = graft.streaming.EventsReader.eventsMs(spark, sfDir)
    assert(ms.schema("tms").dataType == LongType)
    assert(ms.count() > 0)
  }
}
