package graft.sparql

import graft.SparkSpec
import graft.model.QuadStore
import graft.relational.Triplizer

/** Dictionary-encoded BGP evaluation must be observably identical to the
  * direct lexical path — same rows, any order — and the id space must be
  * collision-free on the test corpora (the audit the flag's Scaladoc
  * promises). */
class DictEncodingSpec extends SparkSpec {

  private def both(q: String): (Set[String], Set[String]) = {
    val store = Triplizer.cachedStore(spark, sf(), defaultGraph = true)
    val direct = new Compiler(store).select(q)
    val encoded = new Compiler(store.withDictEncoding).select(q)
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.head, cols.tail: _*).collect()
        .map(_.mkString("")).toSet
    }
    (canon(direct), canon(encoded))
  }

  test("encoded scan == direct scan") {
    val (d, e) = both("SELECT ?s ?o WHERE { ?s <customer#c_mktsegment> ?o }")
    assert(d == e && d.nonEmpty)
  }

  test("encoded chain join == direct (constants, repeated vars, decode)") {
    val (d, e) = both("""
      SELECT ?c ?nname ?rname WHERE {
        ?c <customer#c_nationkey> ?n .
        ?n <nation#n_name> ?nname .
        ?n <nation#n_regionkey> ?r .
        ?r <region#r_name> ?rname }""")
    assert(d == e && d.nonEmpty)
  }

  test("encoded star join == direct") {
    val (d, e) = both("""
      SELECT ?name ?bal ?seg WHERE {
        ?c <customer#c_name> ?name .
        ?c <customer#c_acctbal> ?bal .
        ?c <customer#c_mktsegment> ?seg }""")
    assert(d == e && d.nonEmpty)
  }

  test("encoded path composes with FILTER and modifiers after decode") {
    val (d, e) = both("""
      SELECT ?name ?bal WHERE {
        ?c <customer#c_name> ?name .
        ?c <customer#c_acctbal> ?bal .
        ?c <customer#c_mktsegment> ?seg .
        FILTER(?bal > 5000.0 && ?seg = "BUILDING") }""")
    assert(d == e && d.nonEmpty)
  }

  test("encoded GRAPH ?g binds and decodes the graph variable") {
    val store = Triplizer.cachedStore(spark, sf(), defaultGraph = false)
    val q = """SELECT ?g ?s WHERE { GRAPH ?g { ?s <region#r_name> "ASIA" } }"""
    val direct = new Compiler(store).select(q).collect().map(_.toSeq).toSet
    val encoded = new Compiler(store.withDictEncoding).select(q)
      .collect().map(_.toSeq).toSet
    assert(direct == encoded && direct.nonEmpty)
  }

  test("FROM / FROM NAMED dataset views re-scope in id space (phase 2)") {
    // since phase 2 the encoded path claims FROM views too: g_id equality
    // against constant-folded xxhash64 literals replaces the lexical
    // re-scoping; results must stay identical
    val store = Triplizer.cachedStore(spark, sf(), defaultGraph = false)
    val q = """SELECT ?s ?o FROM <graph/region> WHERE { ?s <region#r_name> ?o }"""
    val direct = new Compiler(store).select(q).collect().map(_.toSeq).toSet
    val encoded = new Compiler(store.withDictEncoding).select(q)
      .collect().map(_.toSeq).toSet
    assert(direct == encoded && direct.nonEmpty)
    // multi-graph merged default (dedup on id triples) + FROM NAMED
    val q2 = """SELECT ?g ?s FROM NAMED <graph/region> FROM NAMED <graph/nation>
                WHERE { GRAPH ?g { ?s <region#r_name> ?o } }"""
    val d2 = new Compiler(store).select(q2).collect().map(_.toSeq).toSet
    val e2 = new Compiler(store.withDictEncoding).select(q2).collect().map(_.toSeq).toSet
    assert(d2 == e2 && d2.nonEmpty)
  }

  test("deferred decode composes with BIND, VALUES, UNION, subqueries, aggregates") {
    // every place the phase-2 Bindings.encoded set must decode on demand:
    // BIND inputs, VALUES compat joins, UNION branch merging, subquery
    // materialization, aggregate inputs + encoded grouping keys + ORDER
    val bindValues = both("""
      SELECT ?c ?tag ?seg WHERE {
        ?c <customer#c_name> ?n .
        ?c <customer#c_mktsegment> ?seg .
        VALUES ?seg { "BUILDING" "MACHINERY" }
        BIND(CONCAT(?n, "/", ?seg) AS ?tag) }""")
    assert(bindValues._1 == bindValues._2 && bindValues._1.nonEmpty)
    val union = both("""
      SELECT ?s ?cname ?sname WHERE {
        { ?s <customer#c_name> ?cname } UNION { ?s <supplier#s_name> ?sname } }""")
    assert(union._1 == union._2 && union._1.nonEmpty)
    val sub = both("""
      SELECT ?seg WHERE {
        { SELECT ?seg WHERE { ?c <customer#c_mktsegment> ?seg } } }""")
    assert(sub._1 == sub._2 && sub._1.nonEmpty)
    val agg = both("""
      SELECT ?seg (AVG(?bal) AS ?a) (COUNT(*) AS ?n) WHERE {
        ?c <customer#c_mktsegment> ?seg . ?c <customer#c_acctbal> ?bal }
      GROUP BY ?seg ORDER BY DESC(?seg) LIMIT 3""")
    assert(agg._1 == agg._2 && agg._1.nonEmpty)
  }

  test("OPTIONAL / MINUS / EXISTS compose with the encoded path (left_outer decode)") {
    // OPTIONAL over encoded bindings makes an encoded var UNDEF-able —
    // its decode join must go left_outer or padded rows vanish
    val opt = both("""
      SELECT ?n ?name ?cname WHERE {
        ?n <nation#n_name> ?name .
        OPTIONAL { ?c <customer#c_nationkey> ?n .
                   ?c <customer#c_name> ?cname .
                   ?c <customer#c_mktsegment> "FURNITURE" } }""")
    assert(opt._1 == opt._2 && opt._1.nonEmpty)
    val minus = both("""
      SELECT ?s ?sname WHERE {
        ?s <supplier#s_name> ?sname .
        MINUS { ?li <lineitem#l_suppkey> ?s . ?li <lineitem#l_returnflag> "R" } }""")
    assert(minus._1 == minus._2)
    val ex = both("""
      SELECT ?s ?sname WHERE {
        ?s <supplier#s_name> ?sname .
        FILTER EXISTS { ?li <lineitem#l_suppkey> ?s } }""")
    assert(ex._1 == ex._2 && ex._1.nonEmpty)
  }

  test("mutations invalidate a materialized encoded source") {
    import spark.implicits._
    val base = QuadStore.fromTriples(spark, Seq(("a", "p", "x")))
    val store = base.withDictEncoding(
      Some((base.encodedQuads, base.termsTable)))
    store.insert(Seq((null: String, "b", "p", "y"))
      .toDF("g", "s", "p", "o"))
    // the stale snapshot would miss b; invalidation recomputes lazily
    val got = new Compiler(store)
      .select("SELECT ?s WHERE { ?s <p> ?o }")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b"), s"got $got")
  }

  test("dictionary is collision-free on the test corpus") {
    val store = Triplizer.cachedStore(spark, sf("sf0.01"), defaultGraph = true)
    assert(store.dictCollisions == 0L)
  }

  test("collision audit detects a forced collision") {
    import spark.implicits._
    // inject a forged terms table (two lexical forms on one id) through
    // the materialized-source hook — the only way to produce a collision
    // without finding a real xxhash64 one — and assert the audit fires
    val base = QuadStore.fromTriples(spark, Seq(("a", "p", "x")))
    val forgedTerms = Seq((1L, "lexA"), (1L, "lexB"), (2L, "lexC"))
      .toDF("id", "lex")
    val ids = base.encodedQuads
    val store = base.withDictEncoding(Some((ids, forgedTerms)))
    assert(store.dictCollisions == 1L)
    // and the clean path still reports zero
    assert(base.withDictEncoding.dictCollisions == 0L)
  }
}
