package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdfio.RdfIO

/** RDF I/O correctness entry: a distributed N-Triples write → read
  * round-trip whose output must hash-match the direct relational
  * projection — the serialization path (term escaping, literal quoting,
  * line framing) is the unit under test, with DuckDB supplying the
  * ground truth from the source parquet.
  */
object RdfIOSuite {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rdfio_nt_roundtrip" -> ((s, dir) => {
      val n = s.read.parquet(s"$dir/nation.parquet")
      val triples = n.select(
        concat(lit("nation/"), col("n_nationkey")).as("s"),
        lit("nation#n_name").as("p"),
        col("n_name").as("o"))
      val path = "/tmp/graft_rdfio_rt/" + new java.io.File(dir).getName
      RdfIO.writeNTriples(triples, path)
      RdfIO.readNTriples(s, path).select("s", "p", "o")
    }))

  val oracleSql: Map[String, String] = Map(
    "rdfio_nt_roundtrip" ->
      """SELECT 'nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                'nation#n_name' AS p, n_name AS o
         FROM nation""")
}
