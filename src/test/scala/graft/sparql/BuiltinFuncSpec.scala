package graft.sparql

import graft.SparkSpec
import graft.model.QuadStore

/** SPARQL 1.1 built-in function library (EXTENSION beyond the reference
  * fragment — its surface is CONCAT + RDF-star accessors only, SURVEY
  * §2.8). Semantics follow SPARQL 1.1 §17.4; every builtin compiles to a
  * codegen'd Catalyst function, no UDFs. */
class BuiltinFuncSpec extends SparkSpec {

  private def store(ts: (String, String, String)*): QuadStore =
    QuadStore.fromTriples(spark, ts)
  private def rows(st: QuadStore, q: String): Seq[Seq[Any]] =
    new Compiler(st).select(q).collect().toSeq.map(_.toSeq)
  private def one(st: QuadStore, bindExpr: String): Any = {
    val r = rows(st, s"SELECT ?out WHERE { ?s <p> ?v . BIND($bindExpr AS ?out) }")
    assert(r.size == 1)
    r.head.head
  }

  private val hello = store(("a", "p", "Hello World"))
  private val num = store(("a", "p", "-2.5"))

  test("hash builtins: MD5/SHA1/SHA256/SHA512 lowercase hex (§17.4.4.11-15)") {
    // the spec's own example value: MD5("abc")
    val abc = store(("a", "p", "abc"))
    assert(one(abc, "MD5(?v)") == "900150983cd24fb0d6963f7d28e17f72")
    assert(one(abc, "SHA1(?v)") == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one(abc, "SHA256(?v)") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one(abc, "SHA512(?v)").toString.length == 128)
  }

  test("string builtins: STR/STRLEN/UCASE/LCASE/SUBSTR") {
    assert(one(hello, "STR(?v)") == "Hello World")
    assert(one(hello, "STRLEN(?v)") == "11")
    assert(one(hello, "UCASE(?v)") == "HELLO WORLD")
    assert(one(hello, "LCASE(?v)") == "hello world")
    // SPARQL SUBSTR is 1-based; 2-arg form runs to the end (§17.4.3.3)
    assert(one(hello, "SUBSTR(?v, 7)") == "World")
    assert(one(hello, "SUBSTR(?v, 1, 5)") == "Hello")
  }

  test("STRBEFORE/STRAFTER incl. the no-match and empty-needle cases (§17.4.3.4-5)") {
    assert(one(hello, """STRBEFORE(?v, " ")""") == "Hello")
    assert(one(hello, """STRAFTER(?v, " ")""") == "World")
    assert(one(hello, """STRBEFORE(?v, "z")""") == "")
    assert(one(hello, """STRAFTER(?v, "z")""") == "")
    assert(one(hello, """STRBEFORE(?v, "")""") == "")
    assert(one(hello, """STRAFTER(?v, "")""") == "Hello World")
  }

  test("REPLACE is regex-based (fn:replace)") {
    assert(one(hello, """REPLACE(?v, "l+", "L")""") == "HeLo WorLd")
    assert(one(hello, """REPLACE(?v, "o", "0")""") == "Hell0 W0rld")
  }

  test("CONTAINS/STRSTARTS/STRENDS as expressions bind true/false") {
    assert(one(hello, """CONTAINS(?v, "lo W")""") == "true")
    assert(one(hello, """STRSTARTS(?v, "Hell")""") == "true")
    assert(one(hello, """STRENDS(?v, "Hell")""") == "false")
  }

  test("boolean builtins in FILTER position are native predicates") {
    val st = store(("a", "p", "alpha"), ("b", "p", "beta"), ("c", "p", "gamma"))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(CONTAINS(?v, "mm")) }""") ==
      Seq(Seq("c")))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(STRSTARTS(?v, "be")) }""") ==
      Seq(Seq("b")))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(STRENDS(?v, "ta")) }""") ==
      Seq(Seq("b")))
  }

  test("REGEX with and without the i flag") {
    val st = store(("a", "p", "Spark"), ("b", "p", "flink"))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(REGEX(?v, "^sp")) }""").isEmpty)
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(REGEX(?v, "^sp", "i")) }""") ==
      Seq(Seq("a")))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(REGEX(?v, "in|ar")) }""")
      .flatten.toSet == Set("a", "b"))
  }

  test("BOUND with OPTIONAL distinguishes matched from padded rows") {
    val st = store(("a", "p", "1"), ("b", "p", "2"), ("a", "q", "x"))
    val r = rows(st,
      "SELECT ?s WHERE { ?s <p> ?v . OPTIONAL { ?s <q> ?w } FILTER(!BOUND(?w)) }")
    assert(r == Seq(Seq("b")))
  }

  test("numeric builtins: ABS/CEIL/FLOOR and xsd-style ROUND (half toward +inf)") {
    assert(one(num, "ABS(?v)") == "2.5")
    assert(one(num, "CEIL(?v)") == "-2")
    assert(one(num, "FLOOR(?v)") == "-3")
    // xsd:round(-2.5) = -2 (toward +inf), NOT java HALF_UP's -3
    assert(one(num, "ROUND(?v)") == "-2")
    val pos = store(("a", "p", "2.5"))
    assert(one(pos, "ROUND(?v)") == "3")
  }

  test("IF reuses FILTER's numeric-else-lexical comparison; COALESCE takes first bound") {
    val st = store(("a", "p", "5"), ("b", "p", "50"))
    val r = rows(st,
      """SELECT ?s ?t WHERE { ?s <p> ?v . BIND(IF(?v > 10, "big", "small") AS ?t) }""")
    assert(r.toSet == Set(Seq("a", "small"), Seq("b", "big")))
    val st2 = store(("a", "p", "1"), ("a", "q", "x"), ("b", "p", "2"))
    val r2 = rows(st2,
      """SELECT ?s ?t WHERE { ?s <p> ?v . OPTIONAL { ?s <q> ?w }
         BIND(COALESCE(?w, "none") AS ?t) }""")
    assert(r2.toSet == Set(Seq("a", "x"), Seq("b", "none")))
  }

  test("GROUP_CONCAT is deterministic (sorted) and honors SEPARATOR; SAMPLE = min") {
    val st = store(("g1", "m", "b"), ("g1", "m", "a"), ("g2", "m", "c"))
    val r = rows(st,
      """SELECT ?s (GROUP_CONCAT(?v; SEPARATOR=", ") AS ?all) (SAMPLE(?v) AS ?one)
         WHERE { ?s <m> ?v } GROUP BY ?s""")
    assert(r.toSet == Set(Seq("g1", "a, b", "a"), Seq("g2", "c", "c")))
    // default separator is a single space (SPARQL §18.5.1.7)
    val r2 = rows(st, "SELECT (GROUP_CONCAT(?v) AS ?all) WHERE { ?s <m> ?v }")
    assert(r2 == Seq(Seq("a b c")))
  }

  test("builtins round-trip through the printer") {
    val qs = Seq(
      """SELECT ?s WHERE { ?s <p> ?v . FILTER(REGEX(?v, "^a", "i")) }""",
      """SELECT ?s ?t WHERE { ?s <p> ?v . BIND(IF(?v > 1, UCASE(?v), STRLEN(?v)) AS ?t) }""",
      """SELECT ?s (GROUP_CONCAT(?v; SEPARATOR="; ") AS ?all) WHERE { ?s <m> ?v } GROUP BY ?s""")
    qs.foreach { q =>
      val ast = SparqlParser.select(q)
      assert(SparqlParser.select(SparqlPrinter.printSelect(ast)) == ast)
    }
  }
}
