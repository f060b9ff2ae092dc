package graft.sparql

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** N3-logic rule documents — the OTHER rule syntax the reference accepts
  * (`datalog/src/parser_n3_logic.rs`): `@prefix` declarations followed by
  * `{ premise triples } => { conclusion triples }` implications, fed to
  * the cross-window SDS reasoner through the RSP engine builder
  * (`kolibrie/src/rsp_engine.rs:293,331-358` `cross_window_rules`).
  *
  * Semantics preserved from the reference:
  *  - terms are `?var`, `<iri>`, or `prefix:local` (expanded through the
  *    document's prefix map; an undeclared prefix keeps its lexical form,
  *    like [[SparqlParser.pname]]);
  *  - triples separated by whitespace, each with an optional trailing `.`;
  *  - multiple conclusion triples are allowed;
  *  - a NESTED rule `{ … } => { t }` inside a clause block contributes
  *    its conclusion triple as a pattern of the OUTER rule — the
  *    reference skips the nested premise wholesale
  *    (`parser_n3_logic.rs:79-97` take_until) and we match that quirk;
  *  - rules carry no negation/filters (the N3 fragment has none).
  *
  * [[parseForSds]] adds the reference's window association
  * (`parse_n3_rules_for_sds`): each predicate constant maps to the window
  * whose IRI is its LONGEST prefix; predicates under a declared prefix
  * that is not a window are collected as output component IRIs.
  */
object N3RuleParser extends RegexParsers {
  override val whiteSpace = """(\s|#[^\n]*)+""".r

  /** Predicate→window and output-component association
    * (`parser_n3_logic.rs:27-38` WindowContext; string IRIs here — the
    * u32 dictionary is the reference's storage detail). */
  final case class WindowContext(
      predicateToWindow: Map[String, String],
      windowWidths: Map[String, Long],
      outputIris: Seq[String])

  private sealed trait UTerm
  private final case class UVar(name: String) extends UTerm
  private final case class UIri(value: String) extends UTerm
  private final case class UPrefixed(value: String) extends UTerm

  // identifier classes admit '_'/'-'/'.' — ?user_id and ex:has_purchase
  // are everyday N3 names (SparqlParser's own varName/pname accept them)
  private def uterm: Parser[UTerm] =
    """\?[A-Za-z_][A-Za-z0-9_]*""".r ^^ (s => UVar(s.drop(1))) |
    """<[^>]*>""".r ^^ (s => UIri(s.substring(1, s.length - 1))) |
    """[A-Za-z0-9_\-]+:[A-Za-z0-9_\-.]+""".r ^^ (UPrefixed(_))

  private def utriple: Parser[(UTerm, UTerm, UTerm)] =
    uterm ~ uterm ~ uterm <~ opt(".") ^^ { case s ~ p ~ o => (s, p, o) }

  /** Nested rule inside a clause block: the reference discards the nested
    * premise and keeps the conclusion triple. */
  private def nestedRule: Parser[(UTerm, UTerm, UTerm)] =
    ("{" ~> """[^}]*""".r <~ "}") ~> "=>" ~> "{" ~> utriple <~ "}"

  private def clauseBlock: Parser[Seq[(UTerm, UTerm, UTerm)]] =
    rep1(nestedRule | utriple)

  private def rule: Parser[(Seq[(UTerm, UTerm, UTerm)], Seq[(UTerm, UTerm, UTerm)])] =
    ("{" ~> clauseBlock <~ "}") ~ ("=>" ~> "{" ~> clauseBlock <~ "}") ^^ {
      case prem ~ concl => (prem, concl)
    }

  private def prefixDecl: Parser[(String, String)] =
    "@prefix" ~> ("""[A-Za-z0-9]+""".r <~ ":") ~ ("""<[^>]*>""".r <~ ".") ^^ {
      case p ~ iri => p -> iri.substring(1, iri.length - 1)
    }

  private def document: Parser[(Map[String, String], Seq[(Seq[(UTerm, UTerm, UTerm)], Seq[(UTerm, UTerm, UTerm)])])] =
    rep(prefixDecl) ~ rep1(rule) ^^ { case ps ~ rs => (ps.toMap, rs) }

  private def resolve(t: UTerm, prefixes: Map[String, String]): Term = t match {
    case UVar(n) => Var(n)
    case UIri(v) => Iri(v)
    case UPrefixed(v) =>
      val i = v.indexOf(':')
      val (p, local) = (v.substring(0, i), v.substring(i + 1))
      prefixes.get(p).map(base => Iri(base + local)).getOrElse(Iri(v))
  }

  /** Parse a document into (prefix map, rules). */
  def parseDocument(text: String): (Map[String, String], Seq[Rule]) =
    parseAll(document, text) match {
      case Success((prefixes, rawRules), _) =>
        val rules = rawRules.zipWithIndex.map { case ((prem, concl), i) =>
          def tps(ts: Seq[(UTerm, UTerm, UTerm)]) = ts.map { case (s, p, o) =>
            TriplePattern(resolve(s, prefixes), resolve(p, prefixes), resolve(o, prefixes))
          }
          Rule(s"n3/rule$i", tps(prem), Nil, Nil, tps(concl))
        }
        (prefixes, rules)
      case f => throw new IllegalArgumentException(s"N3 rule parse error: $f")
    }

  /** Parse + associate predicates with their SDS windows
    * (`parser_n3_logic.rs:286-345`): longest-prefix match of each
    * predicate IRI against the window IRIs; non-window predicates under a
    * declared prefix become output component IRIs. */
  def parseForSds(text: String,
      windowWidths: Map[String, Long]): (Seq[Rule], WindowContext) = {
    val (prefixes, rules) = parseDocument(text)
    val sortedWindows = windowWidths.keys.toSeq.sortBy(-_.length)
    def constPreds(r: Rule): Seq[String] =
      (r.premise ++ r.conclusion).map(_.p).collect { case Iri(v) => v }
    val preds = rules.flatMap(constPreds).distinct
    val predToWindow = preds.flatMap { p =>
      sortedWindows.find(w => p.startsWith(w)).map(p -> _)
    }.toMap
    // ordered dedup in O(N) — calling .result() inside the loop for a
    // membership test materialized the list per predicate (review finding)
    val outputs = scala.collection.mutable.LinkedHashSet.empty[String]
    preds.filterNot(predToWindow.contains).foreach { p =>
      prefixes.values.find(comp => p.startsWith(comp) &&
          !windowWidths.contains(comp)).foreach(outputs += _)
    }
    (rules, WindowContext(predToWindow, windowWidths, outputs.toList))
  }
}
