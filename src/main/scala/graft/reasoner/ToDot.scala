package graft.reasoner

import org.apache.spark.sql.DataFrame
import graft.sparql.Ast._

/** Graphviz DOT export of a fact graph + rule set — the reference's
  * `datalog/src/reasoning/to_dot.rs:9-115` (`ToDot for Reasoner`): every
  * subject/object becomes a labeled node (deterministic ids, sorted),
  * every fact an edge labeled with its predicate, every rule a
  * premise/conclusion box pair joined by an arrow.
  *
  * A debug/visualization surface, so it is deliberately driver-side like
  * the reference — but with a loud row cap instead of an unbounded
  * collect: DOT output beyond ~10⁵ edges is unreadable anyway, so a
  * caller exporting a larger graph gets an error, not an OOM.
  */
object ToDot {

  /** Render facts (a DataFrame with `s`, `p`, `o` string columns) and
    * rules as a DOT digraph. */
  def toDot(facts: DataFrame, rules: Seq[Rule] = Nil,
      maxFacts: Int = 100000): String = {
    val rows = facts.select("s", "p", "o").limit(maxFacts + 1).collect()
    require(rows.length <= maxFacts,
      s"toDot: fact graph exceeds $maxFacts rows — export a filtered subgraph")
    val triples = rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // node ids: sorted distinct subject/object terms (the reference sorts
    // its dictionary ids, to_dot.rs:55-60; lexical sort is our
    // deterministic equivalent)
    val nodes = triples.flatMap(t => Seq(t._1, t._3)).distinct.sorted
    val id = nodes.zipWithIndex.toMap
    val sb = new StringBuilder("digraph {\n")
    nodes.foreach(n => sb.append(s"""${id(n)} [label="${escape(n)}"]\n"""))
    rules.zipWithIndex.foreach { case (r, i) =>
      sb.append(s"""Rule${i}_premise [label="${escape(patterns(r.premise))}", shape=box]\n""")
      sb.append(s"""Rule${i}_conclusion [label="${escape(patterns(r.conclusion))}", shape=box]\n""")
    }
    sb.append("\n")
    triples.foreach { case (s, p, o) =>
      sb.append(s"""${id(s)} -> ${id(o)} [label="${escape(p)}"]\n""")
    }
    rules.indices.foreach(i => sb.append(s"Rule${i}_premise -> Rule${i}_conclusion\n"))
    sb.append("}").toString
  }

  /** `(s, p, o)` per pattern, newline-joined (to_dot.rs:78-91). */
  private def patterns(ps: Seq[TriplePattern]): String =
    ps.map(p => s"(${term(p.s)}, ${term(p.p)}, ${term(p.o)})").mkString("\n")

  /** Mirrors resolve_term_to_string (to_dot.rs:27-39). */
  private def term(t: Term): String = t match {
    case Var(n) => s"?$n"
    case Iri(v) => v
    case Lit(v) => v
    case BNode(l) => s"_:$l"
    case Quoted(s, p, o) => s"<< ${term(s)} ${term(p)} ${term(o)} >>"
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
}
