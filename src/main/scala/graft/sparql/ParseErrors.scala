package graft.sparql

/** Annotated SPARQL parse-error diagnostics — the engine's answer to the
  * reference's `kolibrie/src/error_handler.rs:14-132` (annotate-snippets
  * rendering) and its SPARQL-specific hint heuristics
  * (`error_handler.rs:135-247`): a caret-annotated source snippet with
  * line/column position, specialized titles for the common mistakes
  * (SELECT without WHERE, unbalanced braces, unterminated string
  * literals, undefined prefixes, missing `.`/`;` separators), and a HELP
  * footer suggesting the fix.
  *
  * Pure string formatting on the driver — parse errors happen before any
  * plan exists, so there is nothing distributed about this path.
  */
/** Typed SPARQL/rule syntax failure — subclasses IllegalArgumentException
  * so existing catch sites keep working, but lets the HTTP boundary map
  * parse failures to the `syntax` error CATEGORY (the reference's
  * error_handler.rs distinguishes parse from execution errors; the JSON
  * error response carries the class so clients can too). */
class SparqlParseException(msg: String) extends IllegalArgumentException(msg)

object ParseErrors {

  final case class Diagnostic(title: String, label: String,
      footer: Option[String], line: Int, column: Int, rendered: String)

  /** Build the full annotated diagnostic for a failed parse at
    * (line, column) with the parser's low-level message. */
  def diagnose(input: String, line: Int, column: Int, parserMsg: String): Diagnostic = {
    val offset = offsetOf(input, line, column)
    val specific = detectSpecific(input, offset)
    val (title, label, footer) = specific.getOrElse(
      (s"SPARQL syntax error at line $line, column $column", parserMsg, None))
    Diagnostic(title, label, footer, line, column,
      render(input, line, column, title, label, footer))
  }

  /** The formatted multi-line message `SparqlParser.run` throws. */
  def format(input: String, line: Int, column: Int, parserMsg: String): String =
    diagnose(input, line, column, parserMsg).rendered

  private def offsetOf(input: String, line: Int, column: Int): Int = {
    val lines = input.split("\n", -1)
    val before = lines.take(math.max(0, line - 1)).map(_.length + 1).sum
    math.min(input.length, before + math.max(0, column - 1))
  }

  /** annotate-snippets-style rendering: error title, `query:line:col`
    * locus, the offending line with a `^` caret, optional `= help:`. */
  private def render(input: String, line: Int, column: Int,
      title: String, label: String, footer: Option[String]): String = {
    val lines = input.split("\n", -1)
    val src = if (line >= 1 && line <= lines.length) lines(line - 1) else "[end of input]"
    val gutter = line.toString.length
    val sb = new StringBuilder
    sb.append(s"error: $title\n")
    sb.append(s"${" " * gutter}--> query:$line:$column\n")
    sb.append(s"${" " * gutter} |\n")
    sb.append(s"$line | $src\n")
    sb.append(s"${" " * gutter} | ${" " * math.max(0, column - 1)}^ $label")
    footer.foreach(f => sb.append(s"\n${" " * gutter} |\n${" " * gutter} = help: $f"))
    sb.toString
  }

  /** The reference's ordered specific-error checks
    * (`error_handler.rs:135-180`): first match wins. */
  private def detectSpecific(input: String,
      offset: Int): Option[(String, String, Option[String])] = {
    val lower = input.toLowerCase
    if (lower.contains("select") && !lower.contains("where") &&
        !lower.contains("insert"))
      return Some(("SELECT query missing WHERE clause",
        "SELECT statement found but no WHERE clause",
        Some("SPARQL SELECT queries typically require a WHERE clause. " +
          "Example: SELECT ?var WHERE { ?var ?pred ?obj }")))
    val open = input.count(_ == '{')
    val close = input.count(_ == '}')
    if (open != close)
      return Some(("Unclosed brace in SPARQL query",
        if (open > close) "missing closing '}'" else "extra closing '}'",
        Some(s"Found $open opening '{' but $close closing '}' in the query")))
    // the reference counts quotes before the error offset
    // (error_handler.rs:159-161); our combinator reports the failure AT
    // the opening quote, so also treat an odd whole-input count as the
    // same unterminated-literal signal
    if (input.take(offset).count(_ == '"') % 2 != 0 ||
        input.count(_ == '"') % 2 != 0)
      return Some(("Unterminated string literal",
        "string not closed with matching quote",
        Some("Make sure all string literals are properly closed with " +
          "matching double quotes")))
    checkMissingPrefix(input, offset)
      .orElse(checkMissingSeparator(input, offset))
  }

  /** Undefined-prefix check (`error_handler.rs:183-216`): the word before
    * the error position uses `pfx:` but no PREFIX declares it (the
    * reference's well-known set counts as declared). */
  private def checkMissingPrefix(input: String,
      offset: Int): Option[(String, String, Option[String])] = {
    val wellKnown = Seq("rdf", "rdfs", "owl", "xsd", "foaf", "dc")
    val declared = wellKnown ++ input.split("\n").flatMap { l =>
      val t = l.trim
      if (t.toUpperCase.startsWith("PREFIX ")) {
        val rest = t.drop(7).trim
        val i = rest.indexOf(':')
        if (i >= 0) Some(rest.take(i)) else None
      } else None
    }
    val words = input.take(offset).split("\\s+").filter(_.nonEmpty)
    words.lastOption.collect {
      case w if w.contains(':') && !w.startsWith("<") && !w.startsWith("\"") &&
          !declared.contains(w.takeWhile(_ != ':')) =>
        val p = w.takeWhile(_ != ':')
        (s"Undefined prefix '$p'", s"prefix '$p' is not declared",
          Some(s"Add a PREFIX declaration like: PREFIX $p: <http://example.org/>"))
    }
  }

  /** Missing-separator check (`error_handler.rs:219-247`): the ten
    * characters before the error hold a variable but no `.`/`;`/`{`. */
  private def checkMissingSeparator(input: String,
      offset: Int): Option[(String, String, Option[String])] = {
    val trimmed = input.take(offset).replaceAll("\\s+$", "")
    if (trimmed.nonEmpty && trimmed.contains('?') &&
        (trimmed.last.isLetterOrDigit || trimmed.last == '_')) {
      val last10 = trimmed.takeRight(10)
      if (last10.contains('?') && !last10.contains('.') &&
          !last10.contains(';') && !last10.contains('{'))
        return Some(("Missing separator between triple patterns",
          "expected '.' or ';' to separate triple patterns",
          Some("Triple patterns in SPARQL should be separated by '.' or ';'")))
    }
    None
  }
}
