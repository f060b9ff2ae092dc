package graft.rdfio

import graft.model.TermLex

/** Character-cursor parser for RDF terms in N-Triples / N-Quads / Turtle
  * lexical space, shared by the line readers. Independent implementation
  * of the term surface the reference accepts (`sparql_database.rs:59-101,
  * 1335-1656`): IRIs `<...>`, literals with escapes / language tags /
  * datatypes (datatype stripped, language tag appended — the reference's
  * dictionary cleaning), blank nodes `_:x`, the `a` keyword, and RDF-star
  * quoted triples `<< s p o >>` (nested), encoded via [[TermLex]].
  */
final class RdfTermParser(s: String) {
  private var i = 0

  def eof: Boolean = { skipWs(); i >= s.length }
  def pos: Int = i

  def skipWs(): Unit = {
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
  }

  def peek: Char = s.charAt(i)

  def expect(c: Char): Unit = {
    skipWs()
    if (i >= s.length || s.charAt(i) != c)
      throw new IllegalArgumentException(s"expected '$c' at $i in: $s")
    i += 1
  }

  def tryConsume(tok: String): Boolean = {
    skipWs()
    if (s.startsWith(tok, i)) { i += tok.length; true } else false
  }

  /** Parse one term, returning its storage lexical form. */
  def term(): String = {
    skipWs()
    if (i >= s.length) throw new IllegalArgumentException(s"unexpected end: $s")
    s.charAt(i) match {
      case '<' if s.startsWith("<<", i) => quoted()
      case '<' => iri()
      case '"' => literal()
      case '_' => bnode()
      // ':' is not a PN char, so also exclude it or a prefixed name with
      // prefix 'a:' would misparse as rdf:type + a dangling ':name'
      case 'a' if i + 1 >= s.length ||
          (!isPNChar(s.charAt(i + 1)) && s.charAt(i + 1) != ':') =>
        i += 1; "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
      case _ => pname()
    }
  }

  def iri(): String = {
    expect('<')
    val start = i
    while (i < s.length && s.charAt(i) != '>') i += 1
    if (i >= s.length) throw new IllegalArgumentException(s"unclosed IRI in: $s")
    val v = s.substring(start, i)
    i += 1
    v
  }

  /** Escape-aware literal; strips `^^<dt>`, appends `@lang`
    * (`sparql_database.rs:59-101,1628-1656`). */
  def literal(): String = {
    expect('"')
    val sb = new StringBuilder
    while (i < s.length && s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '"' => sb += '"'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case 'U' =>
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 10
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    if (i >= s.length) throw new IllegalArgumentException(s"unclosed literal in: $s")
    i += 1 // closing quote
    if (s.startsWith("^^", i)) { i += 2; iri(); sb.toString } // datatype stripped
    else if (i < s.length && s.charAt(i) == '@') {
      val start = i
      i += 1
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
      sb.toString + s.substring(start, i) // lang tag appended
    } else sb.toString
  }

  def bnode(): String = {
    val start = i
    i += 2 // "_:"
    while (i < s.length && isPNChar(s.charAt(i))) i += 1
    s.substring(start, i)
  }

  private def isPNChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  /** Prefixed name resolved against `prefixes` (Turtle only); bare
    * numerics/booleans are treated as literal lexical forms. */
  var prefixes: Map[String, String] = Map.empty
  def pname(): String = {
    skipWs()
    val start = i
    while (i < s.length && !s.charAt(i).isWhitespace &&
      !";,.]})".contains(s.charAt(i))) i += 1
    val raw = s.substring(start, i)
    if (raw.isEmpty) throw new IllegalArgumentException(s"empty term at $start in: $s")
    val colon = raw.indexOf(':')
    if (colon >= 0) {
      val pfx = raw.substring(0, colon + 1)
      prefixes.get(pfx) match {
        case Some(ns) => ns + raw.substring(colon + 1)
        case None => raw // absolute IRI-ish or unknown prefix: keep verbatim
      }
    } else raw // numeric/boolean literal lexical form
  }

  def quoted(): String = {
    skipWs()
    if (!tryConsume("<<")) throw new IllegalArgumentException(s"expected << in: $s")
    val st = term(); val p = term(); val o = term()
    if (!tryConsume(">>")) throw new IllegalArgumentException(s"unclosed << in: $s")
    TermLex.encodeQuoted(st, p, o)
  }
}

/** Serialization back to N-Triples-ish lexical space. The store erases the
  * IRI/literal distinction (single dictionary, like the reference), so the
  * writer re-derives it heuristically: blank nodes and quoted triples are
  * structural; a term that looks like an absolute IRI or a relative
  * IRI-path used in subject/predicate position is written `<...>`; all
  * other objects are written as quoted literals. */
object RdfTermWriter {
  private val iriLike = "^[A-Za-z][A-Za-z0-9+.\\-]*:.*$".r
  // language-tag-shaped suffix: letters, then -alnum subtags, at end of
  // value — the SAME shape LANG() recovers (Compiler), so a stored
  // tag-appended literal serializes back to `"lex"@tag` for exactly the
  // suffixes LANG() would report, and both resolve the storage's
  // inherent '@' ambiguity identically
  private val langSuffix = "@([A-Za-z]+(?:-[A-Za-z0-9]+)*)$".r

  def isIriLike(t: String): Boolean =
    t.startsWith("_:") || iriLike.matches(t) || t.contains('/') || t.contains('#')

  def escape(v: String): String =
    v.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }

  def asResource(t: String): String =
    graft.model.TermLex.decodeQuoted(t) match {
      case Some((s, p, o)) => s"<< ${asResource(s)} ${asResource(p)} ${write(o)} >>"
      case None => if (t.startsWith("_:")) t else s"<$t>"
    }

  /** Object position: IRI when IRI-like, literal otherwise; language tag
    * suffix `@xx` re-attached as a tag. */
  def write(t: String): String =
    graft.model.TermLex.decodeQuoted(t) match {
      case Some((s, p, o)) => s"<< ${asResource(s)} ${asResource(p)} ${write(o)} >>"
      case None =>
        if (t.startsWith("_:")) t
        else if (isIriLike(t)) s"<$t>"
        else langSuffix.findFirstMatchIn(t) match {
          case Some(m) if m.start > 0 =>
            "\"" + escape(t.substring(0, m.start)) + "\"" + t.substring(m.start)
          case _ => "\"" + escape(t) + "\""
        }
    }
}
