package graft.tools

import org.apache.spark.sql.SparkSession
import graft.relational.Triplizer
import graft.sparql.Compiler

/** Measurement harness for the dict-encoded phase-2 win condition
  * (VERDICT r4 item 5): direct vs encoded on a join-heavy BGP and on a
  * join+GROUP BY shape where the deferred decode pays — the grouping key
  * stays an 8-byte id through the shuffle and decodes on the aggregated
  * result (25 rows) instead of per input row. Not part of the driver
  * contract; numbers recorded in SURVEY §6.
  */
object EncodedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val direct = new Compiler(Triplizer.cachedStore(spark, sfDir))
    val encoded = new Compiler(Triplizer.cachedEncodedStore(spark, sfDir))

    // join-heavy chain: lineitem → orders → customer → nation
    val joinQ = """
      SELECT ?li ?nname WHERE {
        ?li <lineitem#l_orderkey> ?o .
        ?o <orders#o_custkey> ?c .
        ?c <customer#c_nationkey> ?nk .
        ?nk <nation#n_name> ?nname }"""
    // same chain aggregated: group key decodes post-agg (25 rows)
    val aggQ = """
      SELECT ?nname (COUNT(*) AS ?cnt) WHERE {
        ?li <lineitem#l_orderkey> ?o .
        ?o <orders#o_custkey> ?c .
        ?c <customer#c_nationkey> ?nk .
        ?nk <nation#n_name> ?nname }
      GROUP BY ?nname"""

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val ts = runs.map(_._1).sorted
      println(f"[encoded-probe] $label: min=${ts.head}%.2f med=${ts(ts.size / 2)}%.2f " +
        f"max=${ts.last}%.2f s rows=${runs.head._2}")
    }

    // warm both stores (first touch builds/reads the materialized layouts)
    direct.select(joinQ).count(); encoded.select(joinQ).count()

    time("join  DIRECT ")(direct.select(joinQ).count())
    time("join  ENCODED")(encoded.select(joinQ).count())
    time("agg   DIRECT ")(direct.select(aggQ).count())
    time("agg   ENCODED")(encoded.select(aggQ).count())

    // ---- long-IRI corpus: the string-length variable isolated ----------
    // The testdata's lexical forms are short ("customer/123", ~12 B), so
    // 8-byte ids barely shrink the shuffles. Real RDF corpora carry full
    // IRIs; prefixing every term with a realistic namespace (~36 B extra)
    // shows where the encoded path's crossover sits.
    val prefix = "http://example.org/tpch/v1/resource#"
    import org.apache.spark.sql.functions.{col, concat, lit}
    val longQuads = Triplizer.cachedStore(spark, sfDir).quads
      .select(col("g"), concat(lit(prefix), col("s")).as("s"),
        concat(lit(prefix), col("p")).as("p"),
        concat(lit(prefix), col("o")).as("o"))
      .localCheckpoint()
    val longStore = graft.model.QuadStore(spark, longQuads)
    val encSource = (longStore.encodedQuads.localCheckpoint(),
      longStore.termsTable.localCheckpoint())
    val longDirect = new Compiler(longStore)
    val longEncoded = new Compiler(longStore.withDictEncoding(Some(encSource)))
    def prefixed(q: String): String =
      q.replace("<", s"<$prefix").replace(s"<$prefix/", "</") // only IRIs here
    val joinQL = prefixed(joinQ)
    val aggQL = prefixed(aggQ)
    longDirect.select(joinQL).count(); longEncoded.select(joinQL).count()
    time("join  DIRECT  (long IRIs)")(longDirect.select(joinQL).count())
    time("join  ENCODED (long IRIs)")(longEncoded.select(joinQL).count())
    time("agg   DIRECT  (long IRIs)")(longDirect.select(aggQL).count())
    time("agg   ENCODED (long IRIs)")(longEncoded.select(aggQL).count())
    spark.stop()
  }
}
