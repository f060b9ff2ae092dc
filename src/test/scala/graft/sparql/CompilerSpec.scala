package graft.sparql

import graft.SparkSpec
import graft.model.QuadStore
import org.apache.spark.sql.Row

/** Execution micro-semantics over tiny in-memory stores, mirroring the
  * reference's engine unit tests (`engine.rs:37-168`,
  * `dataset_index.rs:593-825`, `kolibrie/tests/sparql_*`). */
class CompilerSpec extends SparkSpec {

  private def store(ts: (String, String, String)*): QuadStore =
    QuadStore.fromTriples(spark, ts)
  private def qstore(qs: (String, String, String, String)*): QuadStore =
    QuadStore.fromQuads(spark, qs)
  private def rows(st: QuadStore, q: String): Seq[Seq[Any]] =
    new Compiler(st).select(q).collect().toSeq.map(_.toSeq)

  test("bgp join with shared variable") {
    val st = store(("alice", "knows", "bob"), ("bob", "knows", "carol"),
      ("alice", "age", "30"))
    assert(rows(st, "SELECT ?a ?c WHERE { ?a <knows> ?b . ?b <knows> ?c }") ==
      Seq(Seq("alice", "carol")))
  }

  test("union keeps duplicates and pads missing vars with null (engine.rs:328-339)") {
    val st = store(("s1", "p", "x"), ("s1", "q", "x"))
    val r = rows(st, "SELECT ?s ?a ?b WHERE { { ?s <p> ?a } UNION { ?s <q> ?b } }")
    assert(r.size == 2)
    assert(r.contains(Seq("s1", "x", null)) && r.contains(Seq("s1", null, "x")))
  }

  test("union branches see incoming bindings") {
    val st = store(("s1", "p", "1"), ("s2", "p", "2"), ("s1", "q", "y"))
    val r = rows(st, "SELECT ?s ?v WHERE { ?s <p> ?v . { ?s <q> "
      + "\"y\" } UNION { ?s <p> \"2\" } }")
    assert(r.toSet == Set(Seq("s1", "1"), Seq("s2", "2")))
  }

  test("filter scope: filter sees later BINDs in same group (filter_scope_test)") {
    val st = store(("s1", "p", "5"), ("s2", "p", "50"))
    val r = rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(?w > 10) BIND(?v AS ?w) }""")
    assert(r == Seq(Seq("s2")))
  }

  test("LANG/LANGMATCHES/STRLANG over tag-appended storage (sparql_database.rs:1628-1656)") {
    // tagged literals are stored as lex@tag; LANG recovers only
    // tag-SHAPED suffixes (an email's @domain has a dot → "")
    val st = store(("a", "label", "hello@en"), ("b", "label", "salut@fr-CA"),
      ("c", "label", "plain"), ("d", "label", "user@example.com"))
    assert(rows(st, """SELECT ?s ?l WHERE { ?s <label> ?v . BIND(LANG(?v) AS ?l) }""").toSet ==
      Set(Seq("a", "en"), Seq("b", "fr-CA"), Seq("c", ""), Seq("d", "")))
    // basic filtering: range matches exactly or as hyphen prefix, case-
    // insensitively; "*" matches any non-empty tag
    assert(rows(st, """SELECT ?s WHERE { ?s <label> ?v . FILTER(LANGMATCHES(LANG(?v), "FR")) }""") ==
      Seq(Seq("b")))
    assert(rows(st, """SELECT ?s WHERE { ?s <label> ?v . FILTER(LANGMATCHES(LANG(?v), "*")) }""").toSet ==
      Set(Seq("a"), Seq("b")))
    // STRLANG appends per the storage policy; parser accepts "lit"@tag
    assert(rows(st, """SELECT ?t WHERE { <a> <label> ?v . BIND(STRLANG("bye", "en-GB") AS ?t) }""") ==
      Seq(Seq("bye@en-GB")))
    // tagged-literal CONSTANT in a pattern round-trips through the parser
    assert(rows(st, """SELECT ?s WHERE { ?s <label> "hello"@en }""") ==
      Seq(Seq("a")))
  }

  test("numeric-else-lexical comparison (types.rs:349-371)") {
    val st = store(("a", "p", "9"), ("b", "p", "10"), ("c", "p", "x10"))
    // numeric when both parse: 9 < 10 numerically (lexically "9" > "10")
    assert(rows(st, "SELECT ?s WHERE { ?s <p> ?v . FILTER(?v < 10) }") == Seq(Seq("a")))
    // non-numeric falls back to lexical comparison
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(?v > "x") }""") == Seq(Seq("c")))
  }

  test("arithmetic with division-by-zero drops row (query.rs:24-58)") {
    val st = store(("a", "p", "4"), ("b", "p", "0"))
    assert(rows(st, "SELECT ?s WHERE { ?s <p> ?v . FILTER(8 / ?v = 2) }") == Seq(Seq("a")))
  }

  test("GRAPH ?g binds graph including for empty patterns; GRAPH iri filters") {
    val st = qstore(("g1", "s", "p", "o"), ("g2", "s", "p", "o"), (null, "s", "p", "d"))
    val r = rows(st, "SELECT ?g WHERE { GRAPH ?g { ?s <p> ?o } }")
    assert(r.map(_.head).toSet == Set("g1", "g2"))
    assert(rows(st, "SELECT ?o WHERE { GRAPH <g1> { ?s <p> ?o } }") == Seq(Seq("o")))
    // default scope sees only the default graph
    assert(rows(st, "SELECT ?o WHERE { ?s <p> ?o }") == Seq(Seq("d")))
  }

  test("FROM merges graphs with dedup (dataset_index.rs:207-221)") {
    val st = qstore(("g1", "s", "p", "o"), ("g2", "s", "p", "o"))
    assert(rows(st, "SELECT ?o FROM <g1> FROM <g2> WHERE { ?s <p> ?o }") == Seq(Seq("o")))
  }

  test("FROM NAMED restricts GRAPH visibility") {
    val st = qstore(("g1", "s", "p", "o1"), ("g2", "s", "p", "o2"))
    val r = rows(st, "SELECT ?g FROM NAMED <g2> WHERE { GRAPH ?g { ?s <p> ?o } }")
    assert(r == Seq(Seq("g2")))
  }

  test("VALUES with UNDEF joins compatibly (engine.rs:155-167)") {
    val st = store(("s1", "p", "1"), ("s2", "p", "2"))
    val r = rows(st, """SELECT ?s ?v ?w WHERE {
      ?s <p> ?v . VALUES (?v ?w) { ("1" "one") (UNDEF "any") } }""")
    assert(r.toSet == Set(Seq("s1", "1", "one"), Seq("s1", "1", "any"), Seq("s2", "2", "any")))
  }

  test("repeated variable in one pattern") {
    val st = store(("a", "p", "a"), ("a", "p", "b"))
    assert(rows(st, "SELECT ?x WHERE { ?x <p> ?x }") == Seq(Seq("a")))
  }

  test("subquery modifiers: agg → order → project → distinct → limit (engine.rs:685-719)") {
    val st = store(("a", "p", "1"), ("a", "p", "2"), ("b", "p", "3"))
    val r = rows(st, """SELECT ?s ?mx WHERE {
      { SELECT ?s (MAX(?v) AS ?mx) WHERE { ?s <p> ?v } GROUP BY ?s } }""")
    assert(r.map(x => (x(0), x(1))).toSet == Set(("a", 2.0), ("b", 3.0)))
  }

  test("aggregate drops non-numeric values (execute_query.rs:432-465)") {
    val st = store(("a", "p", "1"), ("a", "p", "x"), ("a", "p", "2"))
    val r = rows(st, "SELECT (SUM(?v) AS ?s) (COUNT(*) AS ?n) WHERE { ?a <p> ?v }")
    assert(r == Seq(Seq(3.0, 3L)))
  }

  test("empty input yields one group for global aggregate") {
    val st = store(("a", "q", "1"))
    val r = rows(st, "SELECT (COUNT(*) AS ?n) WHERE { ?a <nope> ?v }")
    assert(r == Seq(Seq(0L)))
  }

  test("negated property set: forward, inverse, and mixed members (§9.1)") {
    val st = store(("a", "p", "b"), ("a", "q", "c"), ("b", "r", "a"))
    // forward-only: any predicate except p
    assert(rows(st, "SELECT ?s ?o WHERE { ?s !<p> ?o }").toSet ==
      Set(Seq("a", "c"), Seq("b", "a")))
    // inverse-only: reversed edges whose predicate is not r
    assert(rows(st, "SELECT ?s ?o WHERE { ?s !(^<r>) ?o }").toSet ==
      Set(Seq("b", "a"), Seq("c", "a")))
    // mixed: forward minus {p,q} = (b,a); reversed minus {r} = (b,a),(c,a)
    assert(rows(st, "SELECT ?s ?o WHERE { ?s !(<p>|<q>|^<r>) ?o }").toSet ==
      Set(Seq("b", "a"), Seq("c", "a")))
    // negated set composes with sequence paths
    assert(rows(st, "SELECT ?s ?o WHERE { ?s <p>/!(<q>) ?o }").toSet ==
      Set(Seq("a", "a")))
  }

  test("projection expressions (expr AS ?v) desugar to Extend (§18.2.4.4)") {
    val st = store(("a", "p", "2"), ("b", "p", "5"))
    // BIND's uniform lexical model: the bound value is a string form
    val r = rows(st, "SELECT ?s (?v * 10 AS ?x) WHERE { ?s <p> ?v }")
    assert(r.map(x => (x(0), x(1))).toSet == Set(("a", "20.0"), ("b", "50.0")))
    // builtin calls work as projection expressions too
    val r2 = rows(st, "SELECT (UCASE(?s) AS ?u) WHERE { ?s <p> ?v }")
    assert(r2.map(_.head).toSet == Set("A", "B"))
    // an aggregate alias is NOT in scope for an expr projection (the
    // desugar binds pre-aggregation): SPARQL error-is-unbound → null
    // (projection order: expr vars first, aggregate aliases appended)
    val r3 = rows(st, "SELECT (SUM(?v) AS ?t) (?t AS ?echo) WHERE { ?s <p> ?v }")
    assert(r3 == Seq(Seq(null, 7.0)))
  }

  test("DISTINCT inside aggregates: COUNT/SUM/AVG/GROUP_CONCAT set forms") {
    // duplicate VALUES come from distinct triples: a repeated identical
    // triple is ONE fact under set semantics (dataset_index HashSets —
    // QuadStore.fromQuads now dedups it away)
    val st = store(("a", "p", "1"), ("b", "p", "1"), ("a", "p", "3"))
    val r = rows(st, """SELECT (COUNT(DISTINCT ?v) AS ?n) (COUNT(?v) AS ?all)
      (SUM(DISTINCT ?v) AS ?s) (AVG(DISTINCT ?v) AS ?a)
      (GROUP_CONCAT(DISTINCT ?v) AS ?g) WHERE { ?x <p> ?v }""")
    assert(r == Seq(Seq(2L, 3L, 4.0, 2.0, "1 3")))
  }

  test("FILTER IN / NOT IN desugar to the =-disjunction (§17.4.1.9)") {
    val st = store(("a", "p", "1"), ("b", "p", "2"), ("c", "p", "3"))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(?v IN ("1", "3")) }""")
      .map(_.head).toSet == Set("a", "c"))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(?v NOT IN ("1", "3")) }""")
      .map(_.head) == Seq("b"))
  }

  test("HAVING reuses a projected aggregate by function+argument") {
    val st = store(("a", "p", "1"), ("a", "p", "2"), ("b", "p", "3"))
    val r = rows(st, """SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s <p> ?v }
      GROUP BY ?s HAVING (COUNT(?v) > 1)""")
    assert(r == Seq(Seq("a", 2L)))
  }

  test("HAVING computes unprojected aggregates synthetically and drops them") {
    val st = store(("a", "p", "1"), ("a", "p", "2"), ("b", "p", "5"))
    val r = rows(st, """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <p> ?v }
      GROUP BY ?s HAVING (SUM(?v) >= 4.0) (MIN(?v) > 0)""")
    // b passes (sum 5, min 5); a fails (sum 3); no __having column leaks
    assert(r == Seq(Seq("b", 1L)))
  }

  test("HAVING alone implies a single implicit group") {
    val st = store(("a", "p", "1"), ("b", "p", "2"))
    assert(rows(st, "SELECT (SUM(?v) AS ?t) WHERE { ?s <p> ?v } HAVING (COUNT(*) > 1)") ==
      Seq(Seq(3.0)))
    assert(rows(st, "SELECT (SUM(?v) AS ?t) WHERE { ?s <p> ?v } HAVING (COUNT(*) > 2)")
      .isEmpty)
  }

  test("bare GROUP BY (no aggregates) yields distinct keys; HAVING filters them") {
    val st = store(("a", "p", "1"), ("a", "p", "2"), ("b", "p", "3"))
    assert(rows(st, "SELECT ?s WHERE { ?s <p> ?v } GROUP BY ?s")
      .map(_.head).toSet == Set("a", "b"))
    assert(rows(st, """SELECT ?s WHERE { ?s <p> ?v } GROUP BY ?s HAVING (?s = "a")""")
      == Seq(Seq("a")))
  }

  test("HAVING can reference group keys and aggregate aliases as atoms") {
    val st = store(("a", "p", "1"), ("a", "p", "2"), ("b", "p", "3"))
    val r = rows(st, """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <p> ?v }
      GROUP BY ?s HAVING (?n = 1 || ?s = "a")""")
    assert(r.map(_.head).toSet == Set("a", "b"))
    val r2 = rows(st, """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <p> ?v }
      GROUP BY ?s HAVING (?s = "b")""")
    assert(r2 == Seq(Seq("b", 1L)))
  }

  test("distinct applied on projection before limit (execute_query.rs:289-304)") {
    val st = store(("a", "p", "1"), ("b", "p", "1"), ("c", "p", "2"))
    val r = rows(st, "SELECT DISTINCT ?v WHERE { ?s <p> ?v } ORDER BY ?v LIMIT 2")
    assert(r == Seq(Seq("1"), Seq("2")))
  }

  test("order by numeric-else-lexical with desc") {
    val st = store(("a", "p", "9"), ("b", "p", "10"), ("c", "p", "2"))
    val r = rows(st, "SELECT ?v WHERE { ?s <p> ?v } ORDER BY DESC(?v)")
    assert(r.map(_.head) == Seq("10", "9", "2"))
  }

  test("rdf-star: TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE round-trip") {
    val st = store(("alice", "says", "hi"))
    val c = new Compiler(st)
    c.execute("""INSERT { <<?s <says> ?o>> <certainty> "0.9" } WHERE { ?s <says> ?o }""")
    val r = rows(st, """SELECT ?subj ?obj WHERE {
      ?t <certainty> "0.9" . FILTER(isTRIPLE(?t))
      BIND(SUBJECT(?t) AS ?subj) BIND(OBJECT(?t) AS ?obj) }""")
    assert(r == Seq(Seq("alice", "hi")))
    // non-quoted terms are not triples
    assert(rows(st, """SELECT ?s WHERE { ?s <says> ?o . FILTER(isTRIPLE(?s)) }""").isEmpty)
  }

  test("update: WHERE evaluated once pre-mutation; deletes before inserts") {
    val st = store(("a", "score", "1"), ("b", "score", "2"))
    val c = new Compiler(st)
    c.execute("""DELETE { ?s <score> ?v } INSERT { ?s <score> "9" } WHERE { ?s <score> ?v }""")
    val r = rows(st, "SELECT ?s ?v WHERE { ?s <score> ?v }")
    assert(r.toSet == Set(Seq("a", "9"), Seq("b", "9")))
  }

  test("insert data / delete data with graphs") {
    val st = store()
    val c = new Compiler(st)
    c.execute("""INSERT DATA { <a> <b> <c> . GRAPH <g> { <d> <e> <f> } }""")
    assert(rows(st, "SELECT ?s WHERE { ?s <b> <c> }") == Seq(Seq("a")))
    assert(rows(st, "SELECT ?s WHERE { GRAPH <g> { ?s <e> <f> } }") == Seq(Seq("d")))
    c.execute("""DELETE DATA { <a> <b> <c> }""")
    assert(rows(st, "SELECT ?s WHERE { ?s <b> <c> }").isEmpty)
  }

  test("update blank nodes: fresh per solution, shared within it (execute_query.rs:610-627)") {
    val st = store(("a", "kind", "x"), ("b", "kind", "x"))
    val c = new Compiler(st)
    c.execute("""INSERT { ?s <attr> _:n . _:n <of> ?s } WHERE { ?s <kind> "x" }""")
    val r = rows(st, "SELECT ?s ?bn WHERE { ?s <attr> ?bn }")
    assert(r.size == 2)
    val nodes = r.map(_(1).asInstanceOf[String])
    assert(nodes.forall(_.startsWith("_:n")))
    assert(nodes.distinct.size == 2) // one fresh node per solution
    // the same label in the second template shares the solution's node
    val back = rows(st, "SELECT ?bn ?s WHERE { ?bn <of> ?s }")
    assert(back.map(x => (x(1), x(0))).toSet == r.map(x => (x(0), x(1))).toSet)
    // re-running allocates new nodes (4 distinct attr objects total)
    c.execute("""INSERT { ?s <attr> _:n } WHERE { ?s <kind> "x" }""")
    assert(rows(st, "SELECT ?bn WHERE { ?s <attr> ?bn }").flatten.distinct.size == 4)
    // blank nodes are illegal in DELETE templates
    intercept[IllegalArgumentException](
      c.execute("""DELETE { ?s <attr> _:n } WHERE { ?s <kind> "x" }"""))
  }

  test("update legality: quoted/blank terms dropped from illegal positions (execute_query.rs:727-796)") {
    val st = store(("a", "says", "hi"))
    val c = new Compiler(st)
    // asserted quoted triple in the store
    c.execute("""INSERT DATA { <<<a> <says> "hi">> <certainty> "0.9" }""")
    // a variable bound to a quoted triple cannot become a predicate: the
    // solution is silently dropped, not an error
    c.execute("""INSERT { <x> ?q <y> } WHERE { ?q <certainty> "0.9" }""")
    assert(rows(st, "SELECT ?o WHERE { <x> ?p ?o }").isEmpty)
    // ... but it is a legal subject/object
    c.execute("""INSERT { <meta> <about> ?q } WHERE { ?q <certainty> "0.9" }""")
    assert(rows(st, "SELECT ?o WHERE { <meta> <about> ?o . FILTER(isTRIPLE(?o)) }").size == 1)
  }

  test("RETRIEVE clause parses (parser.rs:3179-3263)") {
    val r = SparqlParser().parseRetrieve(
      """RETRIEVE SOME LATENT STREAM ?sensor FROM <http://ex.org/streams>
         WITH { ?sensor <type> <TemperatureSensor> . ?sensor <unit> "C" }""")
    assert(r.mode == "SOME" && r.state == "LATENT" && r.variable == "sensor")
    assert(r.fromIri == "http://ex.org/streams" && r.pattern.size == 2)
    val e = SparqlParser().parseRetrieve(
      """RETRIEVE EVERY ACTIVE STREAM ?s FROM <x> WITH { ?s <p> ?o }""")
    assert(e.mode == "EVERY" && e.state == "ACTIVE")
  }

  test("registered UDF callable from BIND (sparql_database.rs:2130-2135)") {
    val st = store(("a", "name", "alice"))
    st.registerUdf("SHOUT", args => args.head.toUpperCase)
    val r = rows(st, """SELECT ?u WHERE { ?s <name> ?n . BIND(SHOUT(?n) AS ?u) }""")
    assert(r == Seq(Seq("ALICE")))
  }

  test("database union merges quads with set semantics (sparql_database.rs:1819-1983)") {
    val a = store(("s1", "p", "x"), ("shared", "p", "y"))
    val b = store(("s2", "p", "z"), ("shared", "p", "y"))
    a.union(b)
    val r = rows(a, "SELECT ?s WHERE { ?s <p> ?o }").map(_.head).toSet
    assert(r == Set("s1", "s2", "shared"))
    assert(a.quads.count() == 3) // duplicate quad deduplicated
  }

  test("CONCAT in BIND") {
    val st = store(("a", "first", "ada"), ("a", "last", "lovelace"))
    val r = rows(st, """SELECT ?full WHERE {
      ?s <first> ?f . ?s <last> ?l . BIND(CONCAT(?f, " ", ?l) AS ?full) }""")
    assert(r == Seq(Seq("ada lovelace")))
  }

  // ---- property-path extensions ------------------------------------------

  test("path sequence, alternative, inverse") {
    val st = store(("a", "p", "b"), ("b", "q", "c"), ("x", "r", "a"))
    assert(rows(st, "SELECT ?s ?o WHERE { ?s <p>/<q> ?o }") == Seq(Seq("a", "c")))
    assert(rows(st, "SELECT ?s ?o WHERE { ?s (<p>|<r>) ?o }").toSet ==
      Set(Seq("a", "b"), Seq("x", "a")))
    assert(rows(st, "SELECT ?s ?o WHERE { ?s ^<p> ?o }") == Seq(Seq("b", "a")))
    // two-step sequence over distinct predicates, and inverses composed:
    // x -r-> a -p-> b, so r/p : (x,b) and ^p/^r : (b,x)
    assert(rows(st, "SELECT ?s ?o WHERE { ?s <r>/<p> ?o }") == Seq(Seq("x", "b")))
    assert(rows(st, "SELECT ?s ?o WHERE { ?s ^<p>/^<r> ?o }") == Seq(Seq("b", "x")))
  }

  test("path + closure; * adds identity; ? is zero-or-one") {
    val st = store(("n1", "next", "n2"), ("n2", "next", "n3"), ("n3", "next", "n4"))
    val plus = rows(st, "SELECT ?s ?o WHERE { ?s <next>+ ?o }").toSet
    assert(plus == Set(
      Seq("n1", "n2"), Seq("n1", "n3"), Seq("n1", "n4"),
      Seq("n2", "n3"), Seq("n2", "n4"), Seq("n3", "n4")))
    val star = rows(st, "SELECT ?s ?o WHERE { ?s <next>* ?o }").toSet
    assert(star == plus ++ Seq("n1", "n2", "n3", "n4").map(n => Seq(n, n)))
    val opt = rows(st, "SELECT ?o WHERE { <n1> <next>? ?o }").map(_.head).toSet
    assert(opt == Set("n1", "n2"))
    // bound endpoints filter the closure
    assert(rows(st, "SELECT ?o WHERE { <n2> <next>+ ?o }").map(_.head).toSet ==
      Set("n3", "n4"))
  }

  test("path modifier requires token adjacency: '<p> ?o' keeps the variable") {
    val st = store(("a", "p", "b"))
    assert(rows(st, "SELECT ?s ?o WHERE { ?s <p> ?o }") == Seq(Seq("a", "b")))
    // and a path pattern composes with plain patterns around it
    val st2 = store(("a", "p", "b"), ("b", "p", "c"), ("c", "tag", "t"))
    assert(rows(st2, "SELECT ?s ?t WHERE { ?s <p>+ ?c . ?c <tag> ?t }").toSet ==
      Set(Seq("a", "t"), Seq("b", "t")))
  }

  // ---- ASK / CONSTRUCT extensions ----------------------------------------

  test("ASK answers solution existence; FROM views respected") {
    val st = qstore(("g1", "s", "p", "o"), (null, "x", "q", "y"))
    def ask(q: String): Boolean =
      new Compiler(st).execute(q).collect().head.getBoolean(0)
    assert(ask("ASK { ?s <q> ?o }"))
    assert(!ask("ASK { ?s <missing> ?o }"))
    // the named graph's triple is invisible to the bare default graph
    assert(!ask("ASK { <s> <p> <o> }"))
    assert(ask("ASK FROM <g1> { <s> <p> <o> }"))
  }

  test("CONSTRUCT instantiates per solution with set semantics; unbound rows drop") {
    val st = store(("alice", "knows", "bob"), ("carol", "knows", "dave"),
      ("bob", "age", "30"))
    val r = new Compiler(st).execute("""
      CONSTRUCT { ?b <tag/knownBy> ?a . ?b <tag/aged> ?age }
      WHERE { ?a <knows> ?b . OPTIONAL { ?b <age> ?age } }""")
      .collect().map(_.toSeq).toSet
    // dave has no age → the second template drops only HIS row
    assert(r == Set(
      Seq("bob", "tag/knownBy", "alice"),
      Seq("dave", "tag/knownBy", "carol"),
      Seq("bob", "tag/aged", "30")))
    // blank-node templates allocate per solution
    val bn = new Compiler(st).execute("""
      CONSTRUCT { ?a <tag/via> _:hop . _:hop <tag/to> ?b }
      WHERE { ?a <knows> ?b }""").collect().map(_.toSeq)
    assert(bn.size == 4)
    val hops = bn.filter(_(1) == "tag/via").map(_(2)).toSet
    assert(hops.size == 2, s"fresh bnode per solution: $hops")
  }

  test("DESCRIBE emits subject triples of var bindings and listed IRIs") {
    val st = store(("alice", "knows", "bob"), ("alice", "age", "30"),
      ("bob", "age", "25"), ("carol", "age", "40"))
    def desc(q: String): Set[Seq[Any]] =
      new Compiler(st).execute(q).collect().map(_.toSeq).toSet
    // var form: describe everyone alice knows
    assert(desc("DESCRIBE ?x WHERE { <alice> <knows> ?x }") ==
      Set(Seq("bob", "age", "25")))
    // iri form, no WHERE
    assert(desc("DESCRIBE <carol>") == Set(Seq("carol", "age", "40")))
    // mixed: var bindings union listed iris, set semantics
    assert(desc("DESCRIBE ?x <carol> WHERE { <alice> <knows> ?x }") ==
      Set(Seq("bob", "age", "25"), Seq("carol", "age", "40")))
    // unmatched WHERE → var contributes nothing
    assert(desc("DESCRIBE ?x WHERE { <nobody> <knows> ?x }").isEmpty)
  }

  // ---- OPTIONAL / MINUS / EXISTS extensions ------------------------------

  test("OPTIONAL pads unmatched rows with null and keeps matches") {
    val st = store(("alice", "knows", "bob"), ("carol", "knows", "dave"),
      ("bob", "age", "30"))
    val r = rows(st, """SELECT ?a ?b ?age WHERE {
      ?a <knows> ?b . OPTIONAL { ?b <age> ?age } }""").toSet
    assert(r == Set(Seq("alice", "bob", "30"), Seq("carol", "dave", null)))
  }

  test("OPTIONAL result vars are UNDEF-compatible in later joins") {
    // after OPTIONAL, ?age may be null; a following pattern binding ?age
    // must use the UNDEF-tolerant compat join (engine.rs:1137-1160 shape)
    val st = store(("alice", "knows", "bob"), ("carol", "knows", "dave"),
      ("bob", "age", "30"), ("lim", "value", "30"))
    val r = rows(st, """SELECT ?a ?age WHERE {
      ?a <knows> ?b . OPTIONAL { ?b <age> ?age } ?l <value> ?age }""").toSet
    // carol's null ?age is compatible with 30 and coalesces to it
    assert(r == Set(Seq("alice", "30"), Seq("carol", "30")))
  }

  test("OPTIONAL filter scopes over the optional group only") {
    val st = store(("alice", "knows", "bob"), ("bob", "age", "5"),
      ("carol", "knows", "dave"), ("dave", "age", "50"))
    val r = rows(st, """SELECT ?a ?age WHERE {
      ?a <knows> ?b . OPTIONAL { ?b <age> ?age . FILTER(?age > 10) } }""").toSet
    assert(r == Set(Seq("alice", null), Seq("carol", "50")))
  }

  test("MINUS removes compatible solutions; disjoint domains keep the row (SPARQL 1.1 §8.3)") {
    val st = store(("alice", "knows", "bob"), ("carol", "knows", "dave"),
      ("bob", "banned", "true"), ("x", "unrelated", "y"))
    val r = rows(st, """SELECT ?a ?b WHERE {
      ?a <knows> ?b . MINUS { ?b <banned> "true" } }""")
    assert(r == Seq(Seq("carol", "dave")))
    // no shared variables → nothing removed
    val r2 = rows(st, """SELECT ?a ?b WHERE {
      ?a <knows> ?b . MINUS { ?z <unrelated> ?w } }""").toSet
    assert(r2 == Set(Seq("alice", "bob"), Seq("carol", "dave")))
  }

  test("FILTER EXISTS / NOT EXISTS semi/anti join; uncorrelated checks emptiness") {
    val st = store(("alice", "knows", "bob"), ("carol", "knows", "dave"),
      ("bob", "age", "30"))
    assert(rows(st, """SELECT ?a WHERE {
      ?a <knows> ?b . FILTER EXISTS { ?b <age> ?x } }""") == Seq(Seq("alice")))
    assert(rows(st, """SELECT ?a WHERE {
      ?a <knows> ?b . FILTER NOT EXISTS { ?b <age> ?x } }""") == Seq(Seq("carol")))
    // uncorrelated: inner non-empty → all rows survive EXISTS
    assert(rows(st, """SELECT ?a WHERE {
      ?a <knows> ?b . FILTER EXISTS { ?z <age> ?x } }""").size == 2)
    assert(rows(st, """SELECT ?a WHERE {
      ?a <knows> ?b . FILTER NOT EXISTS { ?z <missing> ?x } }""").size == 2)
  }

  test("EXISTS nested inside a boolean condition is rejected loudly") {
    val st = store(("a", "p", "1"))
    // grammar: EXISTS only as the whole FILTER — a nested form fails parse
    intercept[IllegalArgumentException] {
      rows(st, """SELECT ?s WHERE { ?s <p> ?v . FILTER(?v > 0 && EXISTS { ?s <q> ?x }) }""")
    }
  }

  // ---- r6 review-pass regressions ----------------------------------------

  test("blank node in a pattern acts as a scoped, non-projectable variable") {
    val st = store(("alice", "knows", "bob"), ("bob", "age", "30"))
    // _:x joins the two patterns like a variable would
    val r = rows(st, "SELECT ?a WHERE { ?a <knows> _:x . _:x <age> ?v }")
    assert(r == Seq(Seq("alice")))
    // SELECT * never projects the bnode column
    val star = new Compiler(st).select("SELECT * WHERE { ?a <knows> _:x }")
    assert(star.columns.toSeq == Seq("a"))
  }

  test("subselect inherits the enclosing FROM dataset and GRAPH scope") {
    val st = qstore(("g1", "s1", "p", "x"), ("g2", "s2", "p", "y"))
    // FROM <g1>: the subselect must evaluate against the same dataset
    val r = rows(st,
      "SELECT ?s FROM <g1> WHERE { { SELECT ?s WHERE { ?s <p> ?o } } }")
    assert(r == Seq(Seq("s1")), s"got $r")
    // inside GRAPH <g2>, the subselect scans g2
    val r2 = rows(st,
      "SELECT ?s WHERE { GRAPH <g2> { { SELECT ?s WHERE { ?s <p> ?o } } } }")
    assert(r2 == Seq(Seq("s2")), s"got $r2")
  }

  test("property paths under GRAPH ?g stay within one graph and bind it") {
    val st = qstore(
      ("g1", "a", "p", "b"), ("g1", "b", "q", "c"),
      ("g2", "b", "q", "z"))
    // seq path: the two hops must come from the SAME graph (g1), and ?g binds
    val r = rows(st, "SELECT ?g ?x WHERE { GRAPH ?g { <a> (<p>/<q>) ?x } }")
    assert(r.toSet == Set(Seq("g1", "c")), s"got $r")
    // closure under GRAPH ?g (used to crash on mismatched columns)
    val st2 = qstore(("g1", "a", "p", "b"), ("g1", "b", "p", "c"),
      ("g2", "c", "p", "d"))
    val r2 = rows(st2, "SELECT ?g ?x WHERE { GRAPH ?g { <a> <p>+ ?x } }")
    assert(r2.toSet == Set(Seq("g1", "b"), Seq("g1", "c")), s"got $r2")
  }

  test("zero-length paths relate ground endpoints absent from the graph") {
    val st = store(("x", "p", "y"))
    // <a> not in the data: p* still relates it to itself (SPARQL 18.4)
    val ask = new Compiler(st).execute("ASK { <a> <p>* <a> }")
      .collect().head.getBoolean(0)
    assert(ask, "zero-length self-path on an absent term must hold")
    val r = rows(st, "SELECT ?x WHERE { <a> <p>? ?x }")
    assert(r == Seq(Seq("a")), s"got $r")
  }
}
