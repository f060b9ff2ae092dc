package graft.sparql

import graft.SparkSpec
import Ast._

/** N3-logic rule parsing, matched against the reference's own rule
  * documents (`kolibrie/benches/citybench_cross_window_compare.rs:33-37`,
  * `family_tree_cross_window_compare.rs:33-40`) and the
  * `parse_n3_rules_for_sds` window association
  * (`datalog/src/parser_n3_logic.rs:286-345`). */
class N3RuleParserSpec extends SparkSpec {

  private val cityBench = """
    @prefix traffic: <http://citybench.example/traffic/> .
    @prefix parking: <http://citybench.example/parking/> .
    @prefix result: <http://citybench.example/result/> .
    { ?road traffic:avgSpeed ?speed . ?lot parking:nearRoad ?road . ?lot parking:occupancy ?occupancy } => { ?road result:congested <true> }
  """

  test("CityBench document: prefixes expand, one rule, window + output association") {
    val widths = Map(
      "http://citybench.example/traffic/" -> 120L,
      "http://citybench.example/parking/" -> 180L)
    val (rules, ctx) = N3RuleParser.parseForSds(cityBench, widths)
    assert(rules.size == 1)
    val r = rules.head
    assert(r.premise == Seq(
      TriplePattern(Var("road"), Iri("http://citybench.example/traffic/avgSpeed"), Var("speed")),
      TriplePattern(Var("lot"), Iri("http://citybench.example/parking/nearRoad"), Var("road")),
      TriplePattern(Var("lot"), Iri("http://citybench.example/parking/occupancy"), Var("occupancy"))))
    assert(r.conclusion == Seq(
      TriplePattern(Var("road"), Iri("http://citybench.example/result/congested"), Iri("true"))))
    assert(r.negativePremise.isEmpty && r.filters.isEmpty)
    // predicate → window by longest IRI prefix
    assert(ctx.predicateToWindow == Map(
      "http://citybench.example/traffic/avgSpeed" -> "http://citybench.example/traffic/",
      "http://citybench.example/parking/nearRoad" -> "http://citybench.example/parking/",
      "http://citybench.example/parking/occupancy" -> "http://citybench.example/parking/"))
    // the result namespace is an OUTPUT component, not a window
    assert(ctx.outputIris == Seq("http://citybench.example/result/"))
  }

  test("family-tree document: multiple rules, recursive reference across namespaces") {
    val doc = """
      @prefix stream1: <http://family.example/people/> .
      @prefix stream2: <http://family.example/derived/> .
      { ?p stream1:parentOf ?c } => { ?p stream2:ancestorOf ?c }
      { ?a stream1:parentOf ?b . ?b stream2:ancestorOf ?c } => { ?a stream2:ancestorOf ?c }
      { ?p stream2:male <true> . ?p stream1:parentOf ?c } => { ?p stream2:fatherOf ?c }
    """
    val (_, rules) = N3RuleParser.parseDocument(doc)
    assert(rules.size == 3)
    assert(rules(1).premise(1).p == Iri("http://family.example/derived/ancestorOf"))
    // the recursive pair has no finite unroll
    assert(graft.streaming.DistributedRsp.ruleChainDepth(rules).isEmpty)
  }

  test("nested rule inside a clause block contributes its conclusion triple (reference quirk)") {
    val doc = """
      { { ?x <p> ?y } => { ?x <q> ?y } ?x <r> ?z } => { ?x <s> ?z }
    """
    val (_, rules) = N3RuleParser.parseDocument(doc)
    assert(rules.size == 1)
    // premise = the NESTED rule's conclusion + the plain triple
    assert(rules.head.premise == Seq(
      TriplePattern(Var("x"), Iri("q"), Var("y")),
      TriplePattern(Var("x"), Iri("r"), Var("z"))))
  }

  test("undeclared prefix keeps its lexical form; parse errors are loud") {
    val (_, rules) = N3RuleParser.parseDocument(
      "{ ?x foo:bar ?y } => { ?x <out> ?y }")
    assert(rules.head.premise.head.p == Iri("foo:bar"))
    intercept[IllegalArgumentException](N3RuleParser.parseDocument("not a rule"))
  }

  test("parsed N3 rules drive the distributed cross-window SDS+ end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val widths = Map(
      "http://citybench.example/traffic/" -> 120L,
      "http://citybench.example/parking/" -> 180L)
    val (rules, _) = N3RuleParser.parseForSds(cityBench, widths)
    val steps = Seq((0L, 60L)).toDF("step", "now")
    val content = Seq(
      (0L, "road1", "http://citybench.example/traffic/avgSpeed", "12", 10L),
      (0L, "lotA", "http://citybench.example/parking/nearRoad", "road1", 20L),
      (0L, "lotA", "http://citybench.example/parking/occupancy", "0.9", 30L))
      .toDF("step", "s", "p", "o", "event_time")
    val live = graft.reasoner.CrossWindowDistributed
      .materializeSteps(steps, content, rules, alphaMs = 120)
    val derived = live.filter(col("p") === "http://citybench.example/result/congested")
      .collect().map(r => (r.getString(1), r.getString(3)))
    assert(derived.toSeq == Seq(("road1", "true")))
  }
}
