package graft.rdfio

import graft.SparkSpec
import graft.model.TermLex
import graft.sparql.Compiler

/** Reader/writer coverage mirroring the reference's format tests
  * (rdf_star_test.rs, named_graph_test.rs, dataset fixtures). */
class RdfIOSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/$name").getPath

  test("n-triples-star reader: literals, lang tags, datatypes, bnodes, nesting") {
    val df = RdfIO.readNTriples(spark, res("star.nt"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("http://ex.org/alice", "http://ex.org/says", "hello")))
    // datatype stripped
    assert(rows.contains(("http://ex.org/bob", "http://ex.org/age", "25")))
    // lang tag appended
    assert(rows.exists(t => t._3 == "Carol@en"))
    // quoted triple subject
    val qt = TermLex.encodeQuoted("http://ex.org/alice", "http://ex.org/age", "30")
    assert(rows.contains((qt, "http://ex.org/certainty", "0.9")))
    // nested quoted triple
    val inner = TermLex.encodeQuoted("http://ex.org/c", "http://ex.org/d", "x")
    val outer = TermLex.encodeQuoted("http://ex.org/a", "http://ex.org/b", inner)
    assert(rows.contains((outer, "http://ex.org/meta", "nested")))
    assert(df.count() == 6)
  }

  test("n-quads reader: named graphs + default graph") {
    val df = RdfIO.readNQuads(spark, res("graphs.nq"))
    val gs = df.collect().map(r => Option(r.getString(0))).toSet
    assert(gs == Set(Some("http://ex.org/g1"), Some("http://ex.org/g2"), None))
  }

  test("turtle reader: prefixes, continuations, annotation syntax, 'a'") {
    val rows = RdfIO.readTurtle(spark, res("annot.ttl")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/bob")))
    assert(rows.contains(("http://ex.org/alice", "http://ex.org/age", "30")))
    // annotation asserts base triple AND quoted-triple metadata
    assert(rows.contains(("http://ex.org/bob", "http://ex.org/likes", "http://ex.org/pizza")))
    val qt = TermLex.encodeQuoted("http://ex.org/bob", "http://ex.org/likes", "http://ex.org/pizza")
    assert(rows.contains((qt, "http://ex.org/since", "2020")))
    assert(rows.contains((qt, "http://ex.org/source", "chat")))
    // 'a' → rdf:type
    assert(rows.contains(("http://ex.org/carol",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://ex.org/Person")))
    // object lists
    assert(Seq("1", "2", "3").forall(v =>
      rows.contains(("http://ex.org/carol", "http://ex.org/scores", v))))
  }

  test("rdf/xml reader: descriptions, typed nodes, resources, text props") {
    val rows = RdfIO.readRdfXml(spark, res("employees.rdf")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("http://example.org/emp/1",
      "http://xmlns.com/foaf/0.1/name", "Alice")))
    assert(rows.contains(("http://example.org/emp/1",
      "http://xmlns.com/foaf/0.1/workplaceHomepage", "http://corp.example.org/hq")))
    // typed node element → rdf:type triple
    assert(rows.contains(("http://example.org/emp/2",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "http://xmlns.com/foaf/0.1/Person")))
  }

  test("n3 reader: prefixes, continuations, typed/lang literals, 'a' (sparql_database.rs:1264-1332)") {
    val rows = RdfIO.readN3(spark, res("people.n3")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.contains(("http://ex.org/alice", "http://xmlns.com/foaf/0.1/name", "Alice")))
    assert(rows.contains(("http://ex.org/alice", "http://xmlns.com/foaf/0.1/knows", "http://ex.org/bob")))
    assert(rows.contains(("http://ex.org/alice", "http://ex.org/age", "30")))
    assert(rows.exists(t => t._1 == "http://ex.org/bob" && t._3 == "Bob@en"))
    assert(rows.contains(("http://ex.org/carol",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://ex.org/Person")))
    assert(rows.size == 5)
  }

  test("n3 round-trips through the turtle writer") {
    val df = RdfIO.readN3(spark, res("people.n3"))
    val out = java.nio.file.Files.createTempDirectory("n3out").toString + "/n3"
    RdfIO.writeTurtle(df, out)
    val back = RdfIO.readN3(spark, out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("n-triples round-trip preserves triples") {
    val df = RdfIO.readNTriples(spark, res("star.nt"))
    val out = java.nio.file.Files.createTempDirectory("ntout").toString + "/nt"
    RdfIO.writeNTriples(df, out)
    val back = RdfIO.readNTriples(spark, out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("writer re-attaches exactly the lang-tag shapes LANG() recovers") {
    // subtagged, bare, and NON-tag '@' suffixes (emails, trailing digits
    // in the first subtag position) — writer and LANG() must agree on
    // which suffixes are tags (the storage's '@' ambiguity, resolved
    // identically on both paths)
    assert(RdfTermWriter.write("duck@en") == "\"duck\"@en")
    assert(RdfTermWriter.write("duck@en-GB") == "\"duck\"@en-GB")
    assert(RdfTermWriter.write("duck@zh-Hant-TW") == "\"duck\"@zh-Hant-TW")
    assert(RdfTermWriter.write("a@b@fr") == "\"a@b\"@fr")
    assert(RdfTermWriter.write("duck@e2") == "\"duck@e2\"")       // digit in primary subtag
    assert(RdfTermWriter.write("user@host1") == "\"user@host1\"") // email-ish
    assert(RdfTermWriter.write("@en") == "\"@en\"")               // empty lexical stays literal
    // and the round-trip through the reader restores the stored form
    val dir = java.nio.file.Files.createTempDirectory("ntlang").toString + "/nt"
    import spark.implicits._
    val tagged = Seq(("s/1", "p/label", "duck@en-GB"), ("s/2", "p/label", "duck@e2"))
      .toDF("s", "p", "o")
    RdfIO.writeNTriples(tagged, dir)
    assert(RdfIO.readNTriples(spark, dir).collect().map(_.toSeq).toSet ==
      tagged.collect().map(_.toSeq).toSet)
  }

  test("n-quads round-trip preserves graphs") {
    val df = RdfIO.readNQuads(spark, res("graphs.nq"))
    val out = java.nio.file.Files.createTempDirectory("nqout").toString + "/nq"
    RdfIO.writeNQuads(df, out)
    val back = RdfIO.readNQuads(spark, out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("turtle writer round-trips through the turtle reader") {
    val df = RdfIO.readNTriples(spark, res("star.nt"))
    val out = java.nio.file.Files.createTempDirectory("ttlout").toString + "/ttl"
    RdfIO.writeTurtle(df, out)
    val back = RdfIO.readTurtle(spark, out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("rdf/xml writer round-trips through the rdf/xml reader") {
    val df = RdfIO.readRdfXml(spark, res("employees.rdf"))
    val out = java.nio.file.Files.createTempDirectory("xmlout").toString + "/out.rdf"
    RdfIO.writeRdfXml(df, out)
    val back = RdfIO.readRdfXml(spark, out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("distributed rdf/xml dir writer shards into multiple valid documents, no collect") {
    val df = RdfIO.readRdfXml(spark, res("employees.rdf"))
    val out = java.nio.file.Files.createTempDirectory("xmldir").toString + "/docs"
    RdfIO.writeRdfXmlDir(df, out, numDocs = Some(3))
    // genuinely sharded: more than one non-empty document part
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.length() > 0)
    assert(parts.length > 1, s"expected multiple document shards, got ${parts.length}")
    // each shard is a COMPLETE well-formed RDF/XML document on its own
    parts.foreach { f =>
      val doc = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(RdfIO.parseRdfXmlDoc(doc).nonEmpty, s"${f.getName} not parseable alone")
    }
    val back = RdfIO.readRdfXml(spark, out)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("turtle: SPARQL-style PREFIX (no dot), escaped backslash, 'a:' prefix") {
    // PREFIX without a trailing dot merges with the next statement on the
    // '.'-split — the prefix branch must parse the remainder, not drop it
    val t1 = RdfIO.parseTurtleDoc(
      "PREFIX ex: <http://ex/>\nex:a ex:b ex:c .")
    assert(t1 == Seq(("http://ex/a", "http://ex/b", "http://ex/c")))
    // literal ending in an ESCAPED backslash: the quote after \\ is real;
    // the next statement must still parse
    val t2 = RdfIO.parseTurtleDoc(
      "<http://x/s> <http://x/p> \"a\\\\\" .\n<http://x/s2> <http://x/p2> <http://x/o2> .")
    assert(t2.map(_._1) == Seq("http://x/s", "http://x/s2"))
    assert(t2.head._3 == "a\\")
    // prefix named 'a:' is a prefixed name, not the rdf:type keyword
    val t3 = RdfIO.parseTurtleDoc(
      "@prefix a: <http://ex/> .\na:s a:p a:o .")
    assert(t3 == Seq(("http://ex/s", "http://ex/p", "http://ex/o")))
    // bare 'a' keyword still works
    val t4 = RdfIO.parseTurtleDoc("<http://x/s> a <http://x/C> .")
    assert(t4.head._2 == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
  }

  test("rdf/xml writer: NCName-suffix split for non-name locals; loud when impossible") {
    import spark.implicits._
    // local part '2020' is not a legal element name — the split walks back
    // to the longest NCName suffix; all-digit locals cannot serialize
    val bad = Seq(("http://x/s", "http://ex/2020", "o")).toDF("s", "p", "o")
    val e = intercept[org.apache.spark.SparkException] {
      val out = java.nio.file.Files.createTempDirectory("rdfxml").toString + "/d"
      RdfIO.writeRdfXmlDir(bad, out)
    }
    assert(e.getMessage.contains("XML-name local part") ||
      e.getCause != null && e.getCause.getMessage.contains("XML-name local part"))
    // a digit-leading SEGMENT with a trailing name part still round-trips
    val ok = Seq(("http://x/s", "http://ex/2020/name", "o")).toDF("s", "p", "o")
    val out2 = java.nio.file.Files.createTempDirectory("rdfxml").toString + "/d2"
    RdfIO.writeRdfXmlDir(ok, out2)
    assert(RdfIO.readRdfXml(spark, out2).collect().map(_.toSeq).toSet ==
      ok.collect().map(_.toSeq).toSet)
  }

  test("loaded store is queryable end-to-end (employee dataset shape)") {
    val store = RdfIO.storeFromRdfXml(spark, res("employees.rdf"))
    val r = new Compiler(store).select("""
      PREFIX foaf: <http://xmlns.com/foaf/0.1/>
      PREFIX ds: <https://data.example.org/>
      SELECT ?name ?sal WHERE {
        ?e foaf:name ?name . ?e ds:annual_salary ?sal . FILTER(?sal > 55000)
      }""").collect().map(r => (r.getString(0), r.getString(1)))
    assert(r.toSeq == Seq(("Alice", "60000")))
  }
}
