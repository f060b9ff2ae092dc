package graft

import org.apache.spark.sql.SparkSession
import graft.rdfio.RdfIO
import graft.sparql.Compiler

/** CLI: load an RDF file and run one SPARQL query — parity with the
  * reference's `cli/src/main.rs:15-43`.
  *
  * Usage: graft.Main <file.{nt,nq,ttl,rdf}> <sparql-query> [maxRows]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Main <rdf-file> <sparql-query> [maxRows]")
      sys.exit(2)
    }
    val Array(path, query) = args.take(2)
    val maxRows = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = path.split('.').last.toLowerCase match {
      case "nq" | "nquads" => RdfIO.storeFromNQuads(spark, path)
      case "ttl" | "turtle" => RdfIO.storeFromTurtle(spark, path)
      case "rdf" | "xml" | "owl" => RdfIO.storeFromRdfXml(spark, path)
      case _ => RdfIO.storeFromNTriples(spark, path)
    }
    new Compiler(store).execute(query).show(maxRows, truncate = false)
    spark.stop()
  }
}
