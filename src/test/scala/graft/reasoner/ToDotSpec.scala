package graft.reasoner

import graft.SparkSpec
import graft.model.QuadStore
import graft.sparql.Ast._

/** DOT export — mirrors the reference's `to_dot.rs` contract: labeled
  * nodes, predicate-labeled edges, rule premise/conclusion boxes. */
class ToDotSpec extends SparkSpec {

  private def facts = QuadStore.fromTriples(spark,
    Seq(("alice", "knows", "bob"), ("bob", "knows", "carol"),
      ("alice", "age", "42"))).quads.select("s", "p", "o")

  private val anc = Rule("anc",
    premise = Seq(
      TriplePattern(Var("x"), Iri("knows"), Var("y")),
      TriplePattern(Var("y"), Iri("knows"), Var("z"))),
    negativePremise = Nil, filters = Nil,
    conclusion = Seq(TriplePattern(Var("x"), Iri("fof"), Var("z"))))

  test("nodes, labeled edges, and rule boxes render") {
    val dot = ToDot.toDot(facts, Seq(anc))
    assert(dot.startsWith("digraph {") && dot.endsWith("}"))
    // deterministic node ids: sorted distinct terms
    val nodes = Seq("42", "alice", "bob", "carol")
    nodes.zipWithIndex.foreach { case (n, i) =>
      assert(dot.contains(s"""$i [label="$n"]"""))
    }
    // edges reference node ids and carry predicate labels
    assert(dot.contains(s"""1 -> 2 [label="knows"]""")) // alice->bob
    assert(dot.contains(s"""2 -> 3 [label="knows"]""")) // bob->carol
    assert(dot.contains(s"""1 -> 0 [label="age"]"""))   // alice->42
    // rule boxes with the pattern rendering and the premise->conclusion arrow
    assert(dot.contains("Rule0_premise [label=\"(?x, knows, ?y)\\n(?y, knows, ?z)\", shape=box]"))
    assert(dot.contains("Rule0_conclusion [label=\"(?x, fof, ?z)\", shape=box]"))
    assert(dot.contains("Rule0_premise -> Rule0_conclusion"))
  }

  test("labels escape quotes and the cap throws loudly") {
    import spark.implicits._
    val f = Seq(("a\"b", "p", "c")).toDF("s", "p", "o")
    val dot = ToDot.toDot(f)
    assert(dot.contains("""[label="a\"b"]"""))
    val big = spark.range(200).selectExpr(
      "cast(id as string) s", "'p' p", "cast(id+1 as string) o")
    val e = intercept[IllegalArgumentException](ToDot.toDot(big, maxFacts = 100))
    assert(e.getMessage.contains("filtered subgraph"))
  }
}
