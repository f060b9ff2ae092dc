package graft.sparql

import Ast._

/** SPARQL text renderer for the supported SELECT fragment — the inverse
  * of [[SparqlParser]] up to whitespace and adjacent-BGP merging.
  * `parse(print(parse(text)))` is a fixpoint (ParserRoundTripSpec
  * property-checks it over generated ASTs); the reference has no
  * equivalent surface (its AST is internal to nom), so this is free
  * functionality the Spark port gets from keeping the algebra first-class.
  *
  * Printing conventions chosen to stay inside the parser's grammar:
  *  - literals always quoted (the parser's bare-number forms reparse to
  *    the same [[Lit]]);
  *  - conditions fully parenthesized (`(a) && (b)`), expressions
  *    parenthesized at each Arith node;
  *  - VALUES always in the multi-variable form.
  */
object SparqlPrinter {

  def printTerm(t: Term): String = t match {
    case Var(n) => s"?$n"
    case Iri(v) => s"<$v>"
    case Lit(v) => "\"" + escape(v) + "\""
    case BNode(l) => s"_:$l"
    case Quoted(s, p, o) => s"<< ${printTerm(s)} ${printTerm(p)} ${printTerm(o)} >>"
  }

  private def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    }

  def printExpr(e: Expr): String = e match {
    case ETerm(t) => printTerm(t)
    case Arith(op, l, r) => s"(${printExpr(l)} $op ${printExpr(r)})"
    case Func("COUNT", Seq()) => "COUNT(*)" // HAVING-only form
    case Func(name, args) => s"$name(${args.map(printExpr).mkString(", ")})"
    case IfExpr(c, t, el) => s"IF(${printCond(c)}, ${printExpr(t)}, ${printExpr(el)})"
  }

  def printCond(c: Condition): String = c match {
    case Cmp(op, l, r) => s"${printExpr(l)} $op ${printExpr(r)}"
    case And(l, r) => s"(${printCond(l)}) && (${printCond(r)})"
    case Or(l, r) => s"(${printCond(l)}) || (${printCond(r)})"
    case Not(x) => s"!(${printCond(x)})"
    case CondFunc(name, args) => s"$name(${args.map(printExpr).mkString(", ")})"
    case _: ExistsCond => throw new IllegalArgumentException(
      "EXISTS prints as a whole FILTER element, not inside a condition")
  }

  private def printPattern(tp: TriplePattern): String =
    s"${printTerm(tp.s)} ${printTerm(tp.p)} ${printTerm(tp.o)} ."

  /** Property path, fully parenthesized; postfix modifiers print with no
    * separating space (the parser requires token adjacency). */
  def printPath(p: Path): String = p match {
    case PLink(i) => s"<$i>"
    case PInv(x) => s"^(${printPath(x)})"
    case PSeq(l, r) => s"(${printPath(l)})/(${printPath(r)})"
    case PAlt(l, r) => s"(${printPath(l)})|(${printPath(r)})"
    case POneOrMore(x) => s"(${printPath(x)})+"
    case PZeroOrMore(x) => s"(${printPath(x)})*"
    case PZeroOrOne(x) => s"(${printPath(x)})?"
    case PNeg(fwd, inv) =>
      (fwd.map(i => s"<$i>") ++ inv.map(i => s"^<$i>")).mkString("!(", "|", ")")
  }

  def printElement(e: Element): String = e match {
    case Bgp(ps) => ps.map(printPattern).mkString(" ")
    case FilterElem(ExistsCond(els, neg)) =>
      s"FILTER ${if (neg) "NOT " else ""}EXISTS { ${els.map(printElement).mkString(" ")} }"
    case FilterElem(c) => s"FILTER(${printCond(c)})"
    case OptionalBlock(els) => s"OPTIONAL { ${els.map(printElement).mkString(" ")} }"
    case MinusBlock(els) => s"MINUS { ${els.map(printElement).mkString(" ")} }"
    case PathPattern(s, p, o) =>
      s"${printTerm(s)} ${printPath(p)} ${printTerm(o)} ."
    case BindElem(expr, v) => s"BIND(${printExpr(expr)} AS ?$v)"
    case GraphBlock(g, els) =>
      val gs = g match {
        case GraphIri(i) => s"<$i>"
        case GraphVar(v) => s"?$v"
        case DefaultGraph => throw new IllegalArgumentException(
          "GRAPH block over the default graph is not printable")
      }
      s"GRAPH $gs { ${els.map(printElement).mkString(" ")} }"
    case UnionBlock(branches) =>
      branches.map(b => s"{ ${b.map(printElement).mkString(" ")} }").mkString(" UNION ")
    case ValuesElem(vars, rows) =>
      val head = vars.map("?" + _).mkString("(", " ", ")")
      val body = rows.map(_.map {
        case Some(t) => printTerm(t)
        case None => "UNDEF"
      }.mkString("(", " ", ")")).mkString(" ")
      s"VALUES $head { $body }"
    case SubSelect(q) => s"{ ${printSelect(q)} }"
    case WindowBlockElem(w, els) =>
      s"WINDOW <$w> { ${els.map(printElement).mkString(" ")} }"
  }

  /** RSP-QL REGISTER query: kind, window clauses (with policies), the
    * grammar's SELECT/WHERE/GROUP BY order (window clauses sit between
    * the projection and WHERE — [[SparqlParser.rspQuery]]). */
  def printRsp(q: RspQuery): String = {
    val kind = q.kind match {
      case RStream => "RSTREAM"; case IStream => "ISTREAM"; case DStream => "DSTREAM"
    }
    val sel = q.select
    val sb = new StringBuilder(s"REGISTER $kind <${q.outIri}> AS SELECT ")
    if (sel.distinct) sb.append("DISTINCT ")
    if (sel.projection == Seq("*")) sb.append("* ")
    else {
      sel.projection.foreach(v => sb.append(s"?$v "))
      sel.aggregates.foreach { a =>
        val arg = (if (a.distinct) "DISTINCT " else "") + a.v.map("?" + _).getOrElse("*")
        val sep = a.sep.map(s => s"""; SEPARATOR="${escape(s)}"""").getOrElse("")
        sb.append(s"(${a.func}($arg$sep) AS ?${a.alias}) ")
      }
    }
    q.windows.zipWithIndex.foreach { case (w, i) =>
      val on = if (w.streamIri == "*") "?s" else s"<${w.streamIri}>"
      sb.append(s"FROM NAMED WINDOW <${w.iri}> ON $on " +
        s"[RANGE ${w.rangeMs} ms STEP ${w.stepMs} ms] ")
      // the parser attaches the LAST policy clause to the query; print it
      // on the final window so parse∘print is stable
      if (i == q.windows.size - 1) q.policy.foreach {
        case WaitPolicy => sb.append("WITH POLICY wait ")
        case StealPolicy => sb.append("WITH POLICY steal ")
        case TimeoutPolicy(ms, steal) =>
          sb.append(s"WITH POLICY (timeout=${ms}ms, fallback=${if (steal) "steal" else "drop"}) ")
      }
    }
    sb.append(s"WHERE { ${sel.where.map(printElement).mkString(" ")} }")
    // the FULL modifier tail — the RSP grammar accepts HAVING / ORDER BY /
    // LIMIT / OFFSET since r6 and dropping them here made print∘parse
    // silently weaker (review finding)
    if (sel.groupBy.nonEmpty)
      sb.append(sel.groupBy.map("?" + _).mkString(" GROUP BY ", " ", ""))
    if (sel.having.nonEmpty)
      sb.append(sel.having.map(c => s"(${printCond(c)})")
        .mkString(" HAVING ", " ", ""))
    if (sel.orderBy.nonEmpty)
      sb.append(sel.orderBy.map(k =>
        if (k.asc) s"ASC(?${k.v})" else s"DESC(?${k.v})")
        .mkString(" ORDER BY ", " ", ""))
    sel.limit.foreach(n => sb.append(s" LIMIT $n"))
    sel.offset.foreach(n => sb.append(s" OFFSET $n"))
    sb.toString
  }

  def printSelect(sel: Select): String = {
    val sb = new StringBuilder("SELECT ")
    if (sel.distinct) sb.append("DISTINCT ")
    if (sel.projection == Seq("*")) sb.append("* ")
    else {
      sel.projection.foreach(v => sb.append(s"?$v "))
      sel.aggregates.foreach { a =>
        val arg = (if (a.distinct) "DISTINCT " else "") + a.v.map("?" + _).getOrElse("*")
        val sep = a.sep.map(s => s"""; SEPARATOR="${escape(s)}"""").getOrElse("")
        sb.append(s"(${a.func}($arg$sep) AS ?${a.alias}) ")
      }
    }
    sel.fromGraphs.foreach(g => sb.append(s"FROM <$g> "))
    sel.fromNamed.foreach(g => sb.append(s"FROM NAMED <$g> "))
    sb.append(s"WHERE { ${sel.where.map(printElement).mkString(" ")} }")
    if (sel.groupBy.nonEmpty)
      sb.append(sel.groupBy.map("?" + _).mkString(" GROUP BY ", " ", ""))
    if (sel.having.nonEmpty)
      sb.append(sel.having.map(c => s"(${printCond(c)})")
        .mkString(" HAVING ", " ", ""))
    if (sel.orderBy.nonEmpty)
      sb.append(sel.orderBy.map(k =>
        if (k.asc) s"ASC(?${k.v})" else s"DESC(?${k.v})")
        .mkString(" ORDER BY ", " ", ""))
    sel.limit.foreach(n => sb.append(s" LIMIT $n"))
    sel.offset.foreach(n => sb.append(s" OFFSET $n"))
    sb.toString
  }
}
