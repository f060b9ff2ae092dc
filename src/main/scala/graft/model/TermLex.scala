package graft.model

import graft.sparql.Ast

/** Storage-level term conventions.
  *
  * The reference interns every term into a bidirectional `String ↔ u32`
  * dictionary (`shared/src/dictionary.rs:17-90`) and marks RDF-star quoted
  * triples with the ID high bit (`shared/src/quoted_triple_store.rs:17-57`).
  *
  * Here terms stay **lexical strings** in the quads DataFrame: Parquet
  * already dictionary+RLE-encodes string columns at the storage layer and
  * Tungsten compares UTF8Strings without decoding, so a global u32
  * dictionary would only add two shuffle-heavy encode/decode joins per
  * query at 100 TB. (A deterministic xxhash64 ID materialization remains
  * available for join-heavy workloads — see graft.model.TermDict.)
  *
  * Conventions (mirroring the reference's dictionary cleaning,
  * `kolibrie/src/sparql_database.rs:1628-1656`):
  *  - IRIs: stored without angle brackets.
  *  - Literals: datatype suffix stripped; language tag appended (`v@en`).
  *  - Quoted triples: a single string ` s  p  o `,
  *    nestable (components may themselves be encoded quoted triples) —
  *    the control characters never occur in cleaned lexical forms.
  *  - Default graph: NULL in the `g` column.
  */
object TermLex {
  val QtOpen = '\u0002'
  val QtSep = '\u0001'
  val QtClose = '\u0003'

  def isQuoted(lex: String): Boolean = lex.nonEmpty && lex.charAt(0) == QtOpen

  def encodeQuoted(s: String, p: String, o: String): String =
    s"$QtOpen$s$QtSep$p$QtSep$o$QtClose"

  /** Decompose an encoded quoted triple, depth-aware for nesting. */
  def decodeQuoted(lex: String): Option[(String, String, String)] = {
    if (!isQuoted(lex) || lex.last != QtClose) return None
    val body = lex.substring(1, lex.length - 1)
    var depth = 0
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < body.length && cuts.length < 2) {
      body.charAt(i) match {
        case QtOpen => depth += 1
        case QtClose => depth -= 1
        case QtSep if depth == 0 => cuts += i
        case _ =>
      }
      i += 1
    }
    if (cuts.length != 2) None
    else Some((body.substring(0, cuts(0)),
               body.substring(cuts(0) + 1, cuts(1)),
               body.substring(cuts(1) + 1)))
  }

  /** Lexical form of a constant AST term (vars have no lexical form). */
  def lexical(t: Ast.Term): String = t match {
    case Ast.Iri(v) => v
    case Ast.Lit(v) => v
    case Ast.Quoted(s, p, o) => encodeQuoted(lexical(s), lexical(p), lexical(o))
    case Ast.BNode(l) => "_:" + l
    case Ast.Var(n) => throw new IllegalArgumentException(s"variable ?$n has no lexical form")
  }
}
