package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{RspEngine, RspEngineBuilder}

/** Ad-hoc driving entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = RspEngineBuilder.fromQuery(spark, """
      REGISTER ISTREAM <http://out/stream> AS
      SELECT *
      FROM NAMED WINDOW :w ON ?stream [RANGE 3 ms STEP 1 ms]
      WHERE { WINDOW :w { ?s a <http://test/IType> . } }""",
      consumer = e => println(s"[rsp] firing close=${e.windowClose} rows=${e.rows}"))
    Seq("A" -> 1L, "B" -> 2L, "C" -> 3L, "D" -> 4L).foreach { case (n, ts) =>
      engine.add("stream", s"http://test/subject$n",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://test/IType", ts)
    }
    println(s"[rsp] total emissions: ${engine.emissions.size}")
    spark.stop()
  }
}
