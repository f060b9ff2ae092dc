package graft.server

import org.apache.spark.sql.SparkSession
import graft.rdfio.RdfIO

/** Standalone server launcher — the counterpart of the reference's
  * `kolibrie-http-server` binary (`src/main.rs:598+` starts the router on
  * a fixed port over an optional preloaded dataset).
  *
  * Usage: graft.server.ServerMain [port] [rdf-file | testdata-sf-dir]
  *
  *  - no data argument: empty base store (queries must POST inline `rdf`)
  *  - a file ending .nt, .nq, .ttl or .rdf: loads it as the base store
  *  - a directory: triplizes the parquet tables there
  *    ([[graft.relational.Triplizer]]) so the playground can query the
  *    benchmark corpus directly
  *
  * Serves the embedded [[Playground]] at `GET /` and blocks until
  * interrupted.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = args.lift(1).map { data =>
      if (new java.io.File(data).isDirectory)
        graft.relational.Triplizer.cachedStore(spark, data, defaultGraph = true)
      else data.split('.').last.toLowerCase match {
        case "nq" | "nquads" => RdfIO.storeFromNQuads(spark, data)
        case "ttl" | "turtle" => RdfIO.storeFromTurtle(spark, data)
        case "rdf" | "xml" | "owl" => RdfIO.storeFromRdfXml(spark, data)
        case _ => RdfIO.storeFromNTriples(spark, data)
      }
    }
    val srv = new GraftHttpServer(spark, base).start(port)
    println(s"graft server listening on http://localhost:${srv.port}/ " +
      s"(playground at /, SPARQL at POST /query)")
    Thread.currentThread().join()
  }
}
