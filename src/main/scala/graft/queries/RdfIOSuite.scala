package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdfio.RdfIO

/** RDF I/O correctness entries: distributed write → read round-trips
  * whose output must hash-match the direct relational projection — the
  * serialization paths (term escaping, literal quoting, line framing,
  * `;` continuations, 3-vs-4-term quad lines) are the unit under test,
  * with DuckDB supplying the ground truth from the source parquet.
  */
object RdfIOSuite {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Second leg: LANG-TAGGED literals (r7 — the tag-appended storage's
    // round-trip: `lex@en-GB` serializes as `"lex"@en-GB` and reads back
    // tag-appended; subtagged + bare tags both exercised, and the writer
    // re-attaches exactly the suffix shape LANG() recovers).
    "rdfio_nt_roundtrip" -> ((s, dir) => {
      val n = s.read.parquet(s"$dir/nation.parquet")
      val triples = n.select(
        concat(lit("nation/"), col("n_nationkey")).as("s"),
        lit("nation#n_name").as("p"),
        col("n_name").as("o"))
        .unionByName(n.select(
          concat(lit("nation/"), col("n_nationkey")).as("s"),
          lit("nation#label").as("p"),
          concat(lower(col("n_name")),
            when(col("n_regionkey") === 2, lit("@en-GB")).otherwise(lit("@fr"))).as("o")))
      val path = "/tmp/graft_rdfio_rt/" + new java.io.File(dir).getName
      RdfIO.writeNTriples(triples, path)
      RdfIO.readNTriples(s, path).select("s", "p", "o")
    }),
    // Turtle sink exercises subject grouping with `;` continuations (two
    // predicates per subject) plus bare-numeric literal objects (a nation
    // key is not IRI-like, so it takes the quoted-literal path).
    "rdfio_turtle_roundtrip" -> ((s, dir) => {
      val sup = s.read.parquet(s"$dir/supplier.parquet")
      val triples = sup.select(
        concat(lit("supplier/"), col("s_suppkey")).as("s"),
        lit("supplier#s_name").as("p"), col("s_name").as("o"))
        .unionByName(sup.select(
          concat(lit("supplier/"), col("s_suppkey")).as("s"),
          lit("supplier#s_nationkey").as("p"),
          col("s_nationkey").cast("string").as("o")))
      val path = "/tmp/graft_rdfio_ttl/" + new java.io.File(dir).getName
      RdfIO.writeTurtle(triples, path)
      RdfIO.readTurtle(s, path).select("s", "p", "o")
    }),
    // N-Quads sink exercises both line forms: odd keys carry a named
    // graph (4-term lines), even keys the default graph (3-term lines,
    // null g on read-back).
    "rdfio_nq_roundtrip" -> ((s, dir) => {
      val n = s.read.parquet(s"$dir/nation.parquet")
      val quads = n.select(
        when(col("n_nationkey") % 2 === 1, lit("graph/odd")).as("g"),
        concat(lit("nation/"), col("n_nationkey")).as("s"),
        lit("nation#n_regionkey").as("p"),
        col("n_regionkey").cast("string").as("o"))
      val path = "/tmp/graft_rdfio_nq/" + new java.io.File(dir).getName
      RdfIO.writeNQuads(quads, path)
      RdfIO.readNQuads(s, path).select("g", "s", "p", "o")
    }),
    // DISTRIBUTED RDF/XML: a directory of per-partition documents written
    // with no driver collect, read back file-parallel. Exercises both
    // property forms (rdf:resource for IRI-like supplier subjects via the
    // customer→supplier pairing, text elements for names) and XML
    // escaping of supplier names containing '&' etc.
    "rdfio_rdfxml_roundtrip" -> ((s, dir) => {
      val sup = s.read.parquet(s"$dir/supplier.parquet")
      val triples = sup.select(
        concat(lit("supplier/"), col("s_suppkey")).as("s"),
        lit("supplier#s_name").as("p"), col("s_name").as("o"))
        .unionByName(sup.select(
          concat(lit("supplier/"), col("s_suppkey")).as("s"),
          lit("supplier#s_nation").as("p"),
          concat(lit("nation/"), col("s_nationkey")).as("o")))
      val path = "/tmp/graft_rdfio_xml/" + new java.io.File(dir).getName
      RdfIO.writeRdfXmlDir(triples, path, numDocs = Some(4))
      RdfIO.readRdfXml(s, path).select("s", "p", "o")
    }))

  val oracleSql: Map[String, String] = Map(
    "rdfio_nt_roundtrip" ->
      """SELECT 'nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                'nation#n_name' AS p, n_name AS o
         FROM nation
         UNION ALL
         SELECT 'nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                'nation#label' AS p,
                lower(n_name) ||
                  CASE WHEN n_regionkey = 2 THEN '@en-GB' ELSE '@fr' END AS o
         FROM nation""",
    "rdfio_turtle_roundtrip" ->
      """SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR) AS s,
                'supplier#s_name' AS p, s_name AS o
         FROM supplier
         UNION ALL
         SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR) AS s,
                'supplier#s_nationkey' AS p, CAST(s_nationkey AS VARCHAR) AS o
         FROM supplier""",
    "rdfio_nq_roundtrip" ->
      """SELECT CASE WHEN n_nationkey % 2 = 1 THEN 'graph/odd' END AS g,
                'nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                'nation#n_regionkey' AS p,
                CAST(n_regionkey AS VARCHAR) AS o
         FROM nation""",
    "rdfio_rdfxml_roundtrip" ->
      """SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR) AS s,
                'supplier#s_name' AS p, s_name AS o
         FROM supplier
         UNION ALL
         SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR) AS s,
                'supplier#s_nation' AS p,
                'nation/' || CAST(s_nationkey AS VARCHAR) AS o
         FROM supplier""")
}
