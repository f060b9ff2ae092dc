package graft.sparql

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** Parser for the reference's SPARQL fragment (grammar surface per
  * `kolibrie/src/parser.rs:3264-3377` and SURVEY §2): prologue PREFIX,
  * SELECT with DISTINCT / aggregates / GROUP BY / ORDER BY / LIMIT /
  * OFFSET / FROM / FROM NAMED, group patterns with BGP / GRAPH / UNION /
  * FILTER / BIND / VALUES / subselect / WINDOW blocks, the six Update
  * forms, RULE definitions, and RSP-QL REGISTER queries.
  *
  * Independent implementation on scala-parser-combinators; the reference
  * uses nom. Differences kept deliberately (SURVEY §7.5): COUNT is
  * parseable here; literals keep the reference's dictionary-cleaning
  * (datatype stripped, language tag appended).
  */
class SparqlParser extends RegexParsers {
  override val whiteSpace = """(\s|#[^\n]*)+""".r

  private var prefixes = Map.empty[String, String]

  // ---- terminals ---------------------------------------------------------
  private def kw(s: String): Parser[String] = ("""(?i)\Q""" + s + """\E""").r ^^ (_ => s)

  def varName: Parser[String] = """[?$]([A-Za-z_][A-Za-z0-9_]*)""".r ^^ (_.drop(1))
  def iriRef: Parser[String] = """<[^<>\s{}|^`\\]*>""".r ^^ (s => s.substring(1, s.length - 1))
  /** Prefixed name; the empty prefix (`:w`) resolves against a declared
    * default prefix or stays verbatim (reference window IRIs use `:w`). */
  def pname: Parser[String] = """([A-Za-z_][A-Za-z0-9_\-]*)?:[A-Za-z0-9_\-.%]*""".r ^^ { s =>
    val i = s.indexOf(':')
    val (pfx, local) = (s.substring(0, i + 1), s.substring(i + 1))
    prefixes.getOrElse(pfx, pfx) + local
  }
  def iri: Parser[String] = iriRef | pname

  def stringLit: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { raw =>
      unescape(raw.substring(1, raw.length - 1))
    }
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 4
          case x => sb += x
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Literal with the reference's cleaning policy: `^^datatype` stripped,
    * `@lang` appended to the lexical form (`sparql_database.rs:1628-1656`). */
  def literal: Parser[Lit] =
    stringLit ~ opt("^^" ~> iri | "@" ~> """[A-Za-z\-]+""".r ^^ ("@" + _)) ^^ {
      case v ~ Some(tag) if tag.startsWith("@") => Lit(v + tag)
      case v ~ _ => Lit(v)
    } |
    """[+-]?\d+\.\d+""".r ^^ (Lit(_)) |
    """[+-]?\d+""".r ^^ (Lit(_)) |
    kw("true") ^^ (_ => Lit("true")) | kw("false") ^^ (_ => Lit("false"))

  def quoted: Parser[Quoted] = "<<" ~> term ~ term ~ term <~ ">>" ^^ {
    case s ~ p ~ o => Quoted(s, p, o)
  }

  def bnode: Parser[BNode] = """_:([A-Za-z0-9_\-]+)""".r ^^ (s => BNode(s.drop(2)))

  def term: Parser[Term] =
    // iri (which includes prefixed names) must win over the bare `a`
    // keyword, or a declared prefix named 'a:' splits after the 'a'
    // (pathPrimary already orders it this way)
    quoted | varName ^^ (Var(_)) | literal | bnode | iri ^^ (Iri(_)) |
      "a" ^^ (_ => Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"))

  // ---- prologue ----------------------------------------------------------
  // the prefix name may be empty: `PREFIX : <iri>` declares the default
  // prefix that pname's `:w` form resolves against
  def prefixDecl: Parser[Unit] = kw("PREFIX") ~> """([A-Za-z_][A-Za-z0-9_\-]*)?:""".r ~ iriRef ^^ {
    case p ~ i => prefixes += (p -> i); ()
  }

  // ---- triples block -----------------------------------------------------
  /** `s p1 o1 ; p2 o2 , o3 .` with `;`/`,` continuations. */
  def triplesSame: Parser[Seq[TriplePattern]] =
    term ~ rep1sep(term ~ rep1sep(term, ","), ";") ^^ { case s ~ pol =>
      pol.flatMap { case p ~ os => os.map(o => TriplePattern(s, p, o)) }
    }
  def triplesBlock: Parser[Seq[TriplePattern]] =
    rep1sep(triplesSame, ".") <~ opt(".") ^^ (_.flatten)

  // ---- property paths (extension, SPARQL 1.1 §9) --------------------------
  /** Postfix path modifier that must follow its operand IMMEDIATELY (no
    * whitespace): `<p>+` is one-or-more, but `<p> ?o` keeps `?o` a
    * variable — the standard grammar's token adjacency, which the default
    * whitespace-skipping parser would destroy. */
  private def pathMod: Parser[String] = new Parser[String] {
    def apply(in: Input): ParseResult[String] =
      if (in.atEnd) Failure("eof", in)
      else in.source.charAt(in.offset) match {
        case c @ ('+' | '*' | '?') => Success(c.toString, in.drop(1))
        case _ => Failure("no path modifier", in)
      }
  }

  /** One member of a negated property set: `iri` (forward) or `^iri`
    * (inverse). Left = forward, Right = inverse. */
  private def negSetMember: Parser[Either[String, String]] =
    "^" ~> iri ^^ (Right(_)) | iri ^^ (Left(_))

  def pathNegatedSet: Parser[Path] =
    "!" ~> ("(" ~> rep1sep(negSetMember, "|") <~ ")" | negSetMember ^^ (Seq(_))) ^^ {
      ms => PNeg(ms.collect { case Left(i) => i }, ms.collect { case Right(i) => i })
    }

  def pathPrimary: Parser[Path] =
    iri ^^ (PLink(_)) |
    "a" ^^ (_ => PLink("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")) |
    pathNegatedSet |
    "(" ~> pathExpr <~ ")"

  def pathElt: Parser[Path] = pathPrimary ~ opt(pathMod) ^^ {
    case p ~ Some("+") => POneOrMore(p)
    case p ~ Some("*") => PZeroOrMore(p)
    case p ~ Some("?") => PZeroOrOne(p)
    case p ~ _ => p
  }

  def pathEltOrInverse: Parser[Path] = "^" ~> pathElt ^^ (PInv(_)) | pathElt

  def pathSequence: Parser[Path] =
    rep1sep(pathEltOrInverse, "/") ^^ (_.reduceLeft(PSeq(_, _)))

  def pathExpr: Parser[Path] =
    rep1sep(pathSequence, "|") ^^ (_.reduceLeft(PAlt(_, _)))

  /** Predicate position inside a SELECT group: a path when path syntax
    * appears, else a plain term. A path that reduces to one bare IRI
    * stays a TriplePattern (identical plans to the pre-path grammar). */
  private def predicatePos: Parser[Either[Term, Path]] =
    pathExpr ^^ { p =>
      p match {
        case PLink(i) => Left(Iri(i)): Either[Term, Path]
        case other => Right(other): Either[Term, Path]
      }
    } | term ^^ (t => Left(t): Either[Term, Path])

  // ---- expressions -------------------------------------------------------
  def funcName: Parser[String] = """[A-Za-z_][A-Za-z0-9_.]*""".r
  def funcCall: Parser[Func] =
    // COUNT(*) — legal only inside HAVING constraints (rewritten to a
    // synthetic aggregate there); compileExpr rejects it elsewhere
    kw("COUNT") ~> "(" ~> "*" <~ ")" ^^ (_ => Func("COUNT", Nil)) |
    funcName ~ ("(" ~> repsep(expr, ",") <~ ")") ^^ {
    case n ~ as => Func(n.toUpperCase match {
      case u @ ("CONCAT" | "TRIPLE" | "SUBJECT" | "PREDICATE" | "OBJECT" | "ISTRIPLE"
          // SPARQL 1.1 built-in library (extensions beyond the fragment)
          | "STR" | "STRLEN" | "UCASE" | "LCASE" | "SUBSTR" | "STRBEFORE" | "STRAFTER"
          | "REPLACE" | "CONTAINS" | "STRSTARTS" | "STRENDS"
          | "ABS" | "CEIL" | "FLOOR" | "ROUND" | "COALESCE"
          | "MD5" | "SHA1" | "SHA256" | "SHA512"
          | "REGEX" | "BOUND" | "ISNUMERIC" | "ISBLANK" | "SAMETERM"
          | "LANG" | "LANGMATCHES" | "STRLANG"
          // aggregates appear as Func inside HAVING — normalize case so
          // the case-sensitive rewriteHaving recognizes `count(?e)` too
          | "COUNT" | "SUM" | "MIN" | "MAX" | "AVG" | "GROUP_CONCAT" | "SAMPLE") => u
      case _ => n
    }, as)
  }

  /** `IF(cond, then, else)` — the first argument is a full FILTER
    * condition, so it gets its own production instead of riding funcCall. */
  def ifExpr: Parser[Expr] =
    kw("IF") ~> "(" ~> condition ~ ("," ~> expr) ~ ("," ~> expr) <~ ")" ^^ {
      case c ~ t ~ e => IfExpr(c, t, e)
    }

  def expr: Parser[Expr] = addExpr
  def addExpr: Parser[Expr] = mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ {
    case h ~ t => t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) }
  }
  def mulExpr: Parser[Expr] = unaryExpr ~ rep(("*" | "/") ~ unaryExpr) ^^ {
    case h ~ t => t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) }
  }
  def unaryExpr: Parser[Expr] =
    "(" ~> addExpr <~ ")" | ifExpr | funcCall | term ^^ (ETerm(_))

  // ---- conditions --------------------------------------------------------
  def condition: Parser[Condition] = orCond
  def orCond: Parser[Condition] = andCond ~ rep("||" ~> andCond) ^^ {
    case h ~ t => t.foldLeft(h)(Or(_, _))
  }
  def andCond: Parser[Condition] = notCond ~ rep("&&" ~> notCond) ^^ {
    case h ~ t => t.foldLeft(h)(And(_, _))
  }
  def notCond: Parser[Condition] =
    "!" ~> notCond ^^ (Not(_)) |
    cmpCond |
    "(" ~> condition <~ ")"
  def cmpCond: Parser[Condition] =
    expr ~ ("!=" | ">=" | "<=" | "=" | ">" | "<") ~ expr ^^ { case l ~ op ~ r => Cmp(op, l, r) } |
    // [NOT] IN desugars at parse time to the =-disjunction SPARQL 1.1
    // §17.4.1.9/.10 defines it as — no new algebra node needed
    expr ~ (opt(kw("NOT")) <~ kw("IN")) ~ ("(" ~> rep1sep(expr, ",") <~ ")") ^^ {
      case l ~ n ~ items =>
        val or = items.map(r => Cmp("=", l, r): Condition).reduce(Or(_, _))
        if (n.isDefined) Not(or) else or
    } |
    funcCall ^^ (f => CondFunc(f.name, f.args)) |
    "(" ~> condition <~ ")"

  // ---- group graph pattern ----------------------------------------------
  def groupGraphPattern: Parser[Seq[Element]] =
    "{" ~> rep(elementSeq) <~ "}" ^^ (_.flatten)

  /** Triples with path predicates split into Bgp runs + PathPattern
    * elements; adjacent plain patterns coalesce into one Bgp so the
    * greedy join-order pre-pass sees the whole conjunction. */
  def elemTriples: Parser[Seq[Element]] =
    rep1sep(elemTriplesSame, ".") <~ opt(".") ^^ { groups =>
      val out = Seq.newBuilder[Element]
      val run = Seq.newBuilder[TriplePattern]
      var runNonEmpty = false
      groups.flatten.foreach {
        case Left(tp) => run += tp; runNonEmpty = true
        case Right(pp) =>
          if (runNonEmpty) { out += Bgp(run.result()); run.clear(); runNonEmpty = false }
          out += pp
      }
      if (runNonEmpty) out += Bgp(run.result())
      out.result()
    }

  private def elemTriplesSame: Parser[Seq[Either[TriplePattern, PathPattern]]] =
    term ~ rep1sep(predicatePos ~ rep1sep(term, ","), ";") ^^ { case s ~ pol =>
      pol.flatMap { case p ~ os => os.map { o =>
        p match {
          case Left(t) => Left(TriplePattern(s, t, o))
          case Right(path) => Right(PathPattern(s, path, o))
        }
      }}
    }

  def elementSeq: Parser[Seq[Element]] =
    element ^^ (Seq(_)) | elemTriples

  def element: Parser[Element] =
    subSelect |
    unionBlock |
    graphBlock |
    windowBlock |
    optionalBlock |
    minusBlock |
    filterElem |
    bindElem |
    valuesElem

  // OPTIONAL / MINUS: extensions beyond the reference fragment (SURVEY
  // §7.5 records them absent there); standard SPARQL 1.1 syntax
  def optionalBlock: Parser[Element] =
    kw("OPTIONAL") ~> groupGraphPattern ^^ (OptionalBlock(_))

  def minusBlock: Parser[Element] =
    kw("MINUS") ~> groupGraphPattern ^^ (MinusBlock(_))

  def graphBlock: Parser[Element] =
    kw("GRAPH") ~> (varName ^^ (GraphVar(_)) | iri ^^ (GraphIri(_))) ~ groupGraphPattern ^^ {
      case g ~ els => GraphBlock(g, els)
    }

  def windowBlock: Parser[Element] =
    kw("WINDOW") ~> iri ~ groupGraphPattern ^^ { case w ~ els => WindowBlockElem(w, els) }

  def unionBlock: Parser[Element] =
    groupGraphPattern ~ rep1(kw("UNION") ~> groupGraphPattern) ^^ {
      case h ~ t => UnionBlock(h +: t)
    }

  def filterElem: Parser[Element] =
    kw("FILTER") ~> kw("NOT") ~> kw("EXISTS") ~> groupGraphPattern ^^ (g =>
      FilterElem(ExistsCond(g, negated = true))) |
    kw("FILTER") ~> kw("EXISTS") ~> groupGraphPattern ^^ (g =>
      FilterElem(ExistsCond(g, negated = false))) |
    kw("FILTER") ~> "(" ~> condition <~ ")" ^^ (FilterElem(_))

  def bindElem: Parser[Element] =
    kw("BIND") ~> "(" ~> expr ~ (kw("AS") ~> varName) <~ ")" ^^ { case e ~ v => BindElem(e, v) }

  def valuesElem: Parser[Element] = {
    val undef = kw("UNDEF") ^^ (_ => None)
    val valueTerm: Parser[Option[Term]] = undef | term ^^ (Some(_))
    kw("VALUES") ~> (
      // multi-var form: VALUES (?a ?b) { (1 2) (3 UNDEF) }
      ("(" ~> rep1(varName) <~ ")") ~ ("{" ~> rep("(" ~> rep1(valueTerm) <~ ")") <~ "}") ^^ {
        case vs ~ rows => ValuesElem(vs, rows)
      } |
      // single-var form: VALUES ?a { 1 2 3 }
      varName ~ ("{" ~> rep1(valueTerm) <~ "}") ^^ {
        case v ~ vals => ValuesElem(Seq(v), vals.map(Seq(_)))
      })
  }

  def subSelect: Parser[Element] = "{" ~> selectQuery <~ "}" ^^ (SubSelect(_))

  // ---- SELECT ------------------------------------------------------------
  def aggFunc: Parser[String] =
    (kw("SUM") | kw("MIN") | kw("MAX") | kw("AVG") | kw("COUNT") |
      kw("GROUP_CONCAT") | kw("SAMPLE")) ^^ (_.toUpperCase)

  def aggProjection: Parser[Aggregate] =
    "(" ~> aggFunc ~
      ("(" ~> (("*" ^^ (_ => (false, None))) |
          opt(kw("DISTINCT")) ~ varName ^^ { case d ~ v => (d.isDefined, Some(v)) }) ~
        opt(";" ~> kw("SEPARATOR") ~> "=" ~> stringLit) <~ ")") ~
      (kw("AS") ~> varName) <~ ")" ^^ {
        case f ~ (((d, v)) ~ sep) ~ a => Aggregate(f, v, a, sep, distinct = d)
      }

  /** One SELECT projection item: a bare variable, an aggregate, or a
    * projection expression `(expr AS ?v)` (§18.2.4.4 Extend) — the last
    * desugars to a BIND at the end of the WHERE group, which is exactly
    * the Extend-before-Project evaluation order for the non-aggregate
    * fragment (an expression over an aggregate ALIAS would need
    * post-aggregation Extend; here the alias is simply not in scope yet,
    * so it evaluates unbound → null, SPARQL's error-is-unbound). */
  private sealed trait ProjItem
  private final case class PVar(v: String) extends ProjItem
  private final case class PAgg(a: Aggregate) extends ProjItem
  private final case class PExpr(e: Expr, v: String) extends ProjItem

  private def projItem: Parser[ProjItem] =
    aggProjection ^^ (PAgg(_)) |
    varName ^^ (PVar(_)) |
    "(" ~> expr ~ (kw("AS") ~> varName) <~ ")" ^^ { case e ~ v => PExpr(e, v) }

  def selectQuery: Parser[Select] =
    kw("SELECT") ~> opt(kw("DISTINCT")) ~
      (("*" ^^ (_ => (Seq.empty[ProjItem], true))) |
        rep1(projItem) ^^ ((_, false))) ~
      rep(kw("FROM") ~> (kw("NAMED") ~> iri ^^ (Right(_)) | iri ^^ (Left(_)))) ~
      (kw("WHERE") ~> groupGraphPattern) ~
      opt(kw("GROUP") ~> kw("BY") ~> rep1(varName)) ~
      opt(kw("HAVING") ~> rep1("(" ~> condition <~ ")")) ~
      opt(kw("ORDER") ~> kw("BY") ~> rep1(orderKey)) ~
      opt(kw("LIMIT") ~> """\d+""".r ^^ (_.toInt)) ~
      opt(kw("OFFSET") ~> """\d+""".r ^^ (_.toInt)) ^^ {
      case dist ~ proj ~ froms ~ where ~ gb ~ hv ~ ob ~ lim ~ off =>
        val (items, star) = proj
        val exprBinds = items.collect { case PExpr(e, v) => BindElem(e, v) }
        Select(
          distinct = dist.isDefined,
          projection = if (star) Seq("*")
            else items.collect { case PVar(v) => v; case PExpr(_, v) => v },
          aggregates = items.collect { case PAgg(a) => a },
          where = where ++ exprBinds,
          groupBy = gb.getOrElse(Nil),
          orderBy = ob.getOrElse(Nil),
          limit = lim, offset = off,
          fromGraphs = froms.collect { case Left(g) => g },
          fromNamed = froms.collect { case Right(g) => g },
          having = hv.getOrElse(Nil))
    }

  def orderKey: Parser[OrderKey] =
    kw("DESC") ~> "(" ~> varName <~ ")" ^^ (OrderKey(_, asc = false)) |
    kw("ASC") ~> "(" ~> varName <~ ")" ^^ (OrderKey(_, asc = true)) |
    varName ^^ (OrderKey(_, asc = true))

  // ---- Update ------------------------------------------------------------
  /** Quad data block: triples + GRAPH <g> { triples } groups. */
  def quadData: Parser[Seq[(TriplePattern, GraphSpec)]] =
    "{" ~> rep(
      kw("GRAPH") ~> iri ~ ("{" ~> opt(triplesBlock) <~ "}") ^^ { case g ~ ts =>
        ts.getOrElse(Nil).map(t => (t, GraphIri(g): GraphSpec))
      } |
      triplesSame <~ opt(".") ^^ (_.map(t => (t, DefaultGraph: GraphSpec)))
    ) <~ "}" ^^ (_.flatten)

  def update: Parser[Update] =
    kw("INSERT") ~> kw("DATA") ~> quadData ^^ (InsertData(_)) |
    kw("DELETE") ~> kw("DATA") ~> quadData ^^ (DeleteData(_)) |
    kw("DELETE") ~> quadData ~ (kw("INSERT") ~> quadData) ~ (kw("WHERE") ~> groupGraphPattern) ^^ {
      case d ~ i ~ w => Modify(d, i, w)
    } |
    kw("DELETE") ~> kw("WHERE") ~> quadData ^^ { d =>
      Modify(d, Nil, Seq(groupFromQuads(d)))
    } |
    kw("DELETE") ~> quadData ~ (kw("WHERE") ~> groupGraphPattern) ^^ {
      case d ~ w => Modify(d, Nil, w)
    } |
    kw("INSERT") ~> quadData ~ (kw("WHERE") ~> groupGraphPattern) ^^ {
      case i ~ w => Modify(Nil, i, w)
    }

  private def groupFromQuads(qs: Seq[(TriplePattern, GraphSpec)]): Element = {
    val byGraph = qs.groupBy(_._2)
    val els = byGraph.toSeq.map {
      case (DefaultGraph, ts) => Bgp(ts.map(_._1))
      case (g, ts) => GraphBlock(g, Seq(Bgp(ts.map(_._1))))
    }
    if (els.size == 1) els.head else UnionBlock(Seq(els)) // all in one group
  }

  // ---- PROB annotation (`parser.rs:2846-3100`) ---------------------------
  // Values are free tokens up to the next top-level comma; auto:cost(…)
  // nests one paren level (take_prob_body / split_top_level_commas).
  private def probValue: Parser[String] =
    """auto:cost\([^)]*\)""".r | """[^,()\s][^,()]*""".r ^^ (_.trim)

  private def probPair: Parser[(String, String)] =
    ("""[A-Za-z_][A-Za-z0-9_]*""".r <~ "=") ~ probValue ^^ { case k ~ v => (k, v) }

  private val hybridKeys = Set("combination", "provenance", "threshold",
    "band_epsilon", "marginal_floor", "k_initial", "k_max", "k_growth",
    "topk_budget_ms", "sdd_budget_ms", "node_budget")

  /** `auto:cost(fp=…, fn=…)` → fp/(fp+fn) (`parser.rs:2897-2932`). */
  private def costRatioThreshold(value: String): Double = {
    val inner = value.stripPrefix("auto:cost(").stripSuffix(")")
    val kv = inner.split(",").map(_.split("=") match {
      case Array(k, v) => k.trim -> v.trim.toDouble
      case _ => throw new IllegalArgumentException(s"bad auto:cost pair in $value")
    }).toMap
    val (fp, fn) = (kv.getOrElse("fp", throw new IllegalArgumentException("auto:cost needs fp")),
      kv.getOrElse("fn", throw new IllegalArgumentException("auto:cost needs fn")))
    require(fp >= 0 && fn >= 0 && fp + fn > 0 && (fp + fn).isFinite,
      "auto:cost costs must be non-negative with positive total")
    fp / (fp + fn)
  }

  def probAnnotation: Parser[ProbAnnotation] =
    kw("PROB") ~> "(" ~> repsep(probPair, ",") <~ ")" ^^ { pairs =>
      val dup = pairs.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
      val kv = pairs.toMap
      val provenance = kv.get("provenance").orElse(kv.get("combination")).getOrElse("independent")
      val isAutoCost = kv.get("threshold").exists(_.startsWith("auto:cost"))
      val threshold = kv.get("threshold").map { v =>
        if (isAutoCost) {
          require(provenance == "hybrid", "auto:cost threshold requires provenance=hybrid")
          costRatioThreshold(v)
        } else v.toDouble
      }
      var ann = ProbAnnotation(provenance, threshold,
        thresholdPolicy = if (isAutoCost) "auto:cost" else "explicit",
        confidence = kv.get("confidence").flatMap(_.toDoubleOption))
      def d(k: String, f: (ProbAnnotation, Double) => ProbAnnotation): Unit =
        kv.get(k).foreach(v => ann = f(ann, v.toDouble))
      def i(k: String, f: (ProbAnnotation, Int) => ProbAnnotation): Unit =
        kv.get(k).foreach(v => ann = f(ann, v.toInt))
      d("band_epsilon", (a, v) => a.copy(bandEpsilon = v))
      d("marginal_floor", (a, v) => a.copy(marginalGainFloor = v))
      i("k_initial", (a, v) => a.copy(kInitial = v))
      i("k_max", (a, v) => a.copy(kMax = v))
      i("k_growth", (a, v) => a.copy(kGrowth = v))
      kv.get("topk_budget_ms").foreach(v => ann = ann.copy(topkBudgetMs = v.toLong))
      kv.get("sdd_budget_ms").foreach(v => ann = ann.copy(sddBudgetMs = v.toLong))
      i("node_budget", (a, v) => a.copy(sddNodeBudget = v))
      if (provenance == "hybrid") {
        // `parser.rs:3003-3034`: hybrid validates strictly — no unknown or
        // duplicate keys, no confidence, threshold mandatory and in range
        require(dup.isEmpty, s"duplicate PROB key: ${dup.get}")
        val unknown = kv.keySet -- hybridKeys
        require(unknown.isEmpty, s"unknown PROB key(s) for hybrid: ${unknown.mkString(",")}")
        require(!kv.contains("confidence"), "hybrid does not accept confidence")
        require(ann.threshold.exists(t => t.isFinite && t >= 0.0 && t <= 1.0),
          "hybrid requires threshold in [0, 1]")
        require(ann.bandEpsilon >= 0.0 && ann.bandEpsilon <= 1.0, "band_epsilon must be in [0, 1]")
        require(ann.marginalGainFloor >= 0.0, "marginal_floor must be non-negative")
        require(ann.kInitial >= 1 && ann.kInitial <= ann.kMax, "require 1 <= k_initial <= k_max")
        require(ann.kGrowth >= 2, "k_growth must be >= 2")
      }
      ann
    }

  // ---- RULE (`parser.rs:3101-3177`) --------------------------------------
  def ruleDef: Parser[Rule] =
    kw("RULE") ~> iri ~ opt(probAnnotation) ~ opt("(" ~> repsep(varName, ",") <~ ")") ~ (":-" ~>
      kw("CONSTRUCT") ~> "{" ~> triplesBlock <~ "}") ~ (kw("WHERE") ~> "{" ~>
      rep(filterElem ^^ (Right(_)) |
          kw("NOT") ~> "{" ~> triplesBlock <~ "}" ^^ (ts => Left(Left(ts))) |
          triplesBlock ^^ (ts => Left(Right(ts)))) <~ "}") ^^ {
      case name ~ ann ~ _ ~ concl ~ body =>
        Rule(
          name,
          premise = body.collect { case Left(Right(ts)) => ts }.flatten,
          negativePremise = body.collect { case Left(Left(ts)) => ts }.flatten,
          filters = body.collect { case Right(FilterElem(c)) => c },
          conclusion = concl,
          prob = ann)
    }

  // ---- RSP-QL (`parser.rs:2594-2846`) ------------------------------------
  def duration: Parser[Long] =
    // unit needs a word boundary: a bare kw("s") consumed the 'S' of a
    // following STEP keyword, making `[RANGE 10 STEP 5]` unparseable
    """\d+""".r ~ opt("""(?i)(ms|s|m|h)(?![A-Za-z0-9_])""".r) ^^ {
      case n ~ u => n.toLong * (u.map(_.toLowerCase) match {
        case Some("ms") => 1L; case Some("s") => 1000L
        case Some("m") => 60000L; case Some("h") => 3600000L; case None => 1000L
      })
    }

  /** Policy duration (`parser.rs:2677-2703`): `5s`, `5000ms`,
    * `PT5S`/`PT5M`/`PT5H`, or a bare integer meaning seconds. */
  def policyDuration: Parser[Long] =
    ("PT" ~> """\d+""".r ~ ("S" | "M" | "H") ^^ { case n ~ u =>
      n.toLong * (u match { case "S" => 1000L; case "M" => 60000L; case _ => 3600000L })
    }) |
    ("""\d+""".r ~ opt("ms" | "s") ^^ { case n ~ u =>
      n.toLong * (u match { case Some("ms") => 1L; case _ => 1000L })
    })

  /** `WITH POLICY steal|wait|(timeout=<dur>, fallback=steal|drop)`
    * (`parser.rs:2705-2775`). */
  def policySpec: Parser[SyncPolicySpec] =
    kw("steal") ^^ (_ => StealPolicy) |
    kw("wait") ^^ (_ => WaitPolicy) |
    ("(" ~> kw("timeout") ~> "=" ~> policyDuration ~
      ("," ~> kw("fallback") ~> "=" ~> (kw("steal") ^^ (_ => true) |
        kw("drop") ^^ (_ => false))) <~ ")") ^^ {
      case ms ~ steal => TimeoutPolicy(ms, steal)
    }

  /** `REPORT` strategies inside the window bracket (`parser.rs:2644-2653`). */
  def reportStrategyKw: Parser[String] =
    kw("ON_WINDOW_CLOSE") | kw("ON_CONTENT_CHANGE") |
    kw("NON_EMPTY_CONTENT") | kw("PERIODIC")

  /** `TICK` strategies (`parser.rs:2655-2661`): the reference PARSES all
    * three but only TimeDriven executes (`rsp/s2r.rs:246-264` no-ops the
    * other arms, so such windows silently never fire). The grammar here
    * accepts the same surface; [[graft.streaming.RspEngine]] refuses
    * non-TIME_DRIVEN loudly with the typed `unsupported` category instead
    * of the reference's silent never-firing window. */
  def tickKw: Parser[String] =
    kw("TIME_DRIVEN") | kw("TUPLE_DRIVEN") | kw("BATCH_DRIVEN")

  /** `ON ?s` (stream variable = match all streams, `rsp_engine.rs:773-810`)
    * is represented as stream IRI "*". The window bracket accepts the
    * reference's full surface (`parser.rs:2594-2664`): RANGE / TUMBLING /
    * SLIDING width, optional STEP, optional REPORT, optional TICK. The
    * window-type keyword carries no extra semantics there either — width +
    * slide (defaulted to width, i.e. tumbling) drive the engine
    * (`rsp/builder.rs:247-250`). */
  def windowClause: Parser[(WindowSpec, Option[SyncPolicySpec])] =
    kw("FROM") ~> kw("NAMED") ~> kw("WINDOW") ~> iri ~
      (kw("ON") ~> (varName ^^ (_ => "*") | iri)) ~
      ("[" ~> (kw("RANGE") | kw("TUMBLING") | kw("SLIDING")) ~> duration ~
        opt(kw("STEP") ~> duration) ~ opt(kw("REPORT") ~> reportStrategyKw) ~
        opt(kw("TICK") ~> tickKw) <~ "]") ~
      opt(kw("WITH") ~> kw("POLICY") ~> policySpec) ^^ {
      case w ~ s ~ (r ~ st ~ rep ~ tick) ~ pol =>
        (WindowSpec(w, s, r, st.getOrElse(r), rep, tick), pol)
    }

  def rspQuery: Parser[RspQuery] =
    kw("REGISTER") ~> (kw("RSTREAM") ^^ (_ => RStream) | kw("ISTREAM") ^^ (_ => IStream) |
      kw("DSTREAM") ^^ (_ => DStream)) ~ iri ~ (kw("AS") ~>
      kw("SELECT") ~> opt(kw("DISTINCT")) ~
        (("*" ^^ (_ => None)) |
          rep1(aggProjection ^^ (Right(_)) | varName ^^ (Left(_))) ^^ (items => Some(items)))) ~
      rep1(windowClause) ~ (kw("WHERE") ~> groupGraphPattern) ~
      opt(kw("GROUP") ~> kw("BY") ~> rep1(varName)) ~
      opt(kw("HAVING") ~> rep1("(" ~> condition <~ ")")) ~
      opt(kw("ORDER") ~> kw("BY") ~> rep1(orderKey)) ~
      opt(kw("LIMIT") ~> """\d+""".r ^^ (_.toInt)) ~
      opt(kw("OFFSET") ~> """\d+""".r ^^ (_.toInt)) ^^ {
      case kind ~ out ~ (dist ~ proj) ~ wins ~ where ~ gb ~ hv ~ ob ~ lim ~ off =>
        val (vars, aggs) = proj match {
          case None => (Seq("*"), Nil)
          case Some(items) =>
            (items.collect { case Left(v) => v },
             items.collect { case Right(a) => a })
        }
        RspQuery(kind, out,
          wins.map(_._1),
          Select(dist.isDefined, vars, aggs,
            where, gb.getOrElse(Nil), ob.getOrElse(Nil), lim, off, Nil, Nil,
            having = hv.getOrElse(Nil)),
          policy = wins.flatMap(_._2).lastOption)
    }

  // ---- ML surface (`parser.rs:2219-2580`) --------------------------------
  /** `MODEL <n> { mlp(hidden=8,4); output "a" "b"; }` → (name, hidden,
    * outputs, binary). Single output label = binary head. */
  def modelDecl: Parser[(String, Seq[Int], Seq[String])] =
    kw("MODEL") ~> iri ~ ("{" ~> kw("mlp") ~> "(" ~> kw("hidden") ~> "=" ~>
      repsep("""\d+""".r ^^ (_.toInt), ",") <~ ")" <~ opt(";")) ~
      (kw("output") ~> rep1(stringLit) <~ opt(";") <~ "}") ^^ {
      case n ~ h ~ outs => (n, h, outs)
    }

  /** `NEURAL RELATION <pred> USING MODEL <m> { INPUT { SELECT … }
    * FEATURES ?a ?b ANCHOR ?c }`. */
  def neuralRelationDecl: Parser[(String, String, Select, Seq[String], String)] =
    kw("NEURAL") ~> kw("RELATION") ~> iri ~ (kw("USING") ~> kw("MODEL") ~> iri) ~
      ("{" ~> kw("INPUT") ~> "{" ~> selectQuery <~ "}") ~
      (kw("FEATURES") ~> rep1(varName)) ~ (kw("ANCHOR") ~> varName) <~ "}" ^^ {
      case p ~ m ~ q ~ fs ~ a => (p, m, q, fs, a)
    }

  /** `ML.PREDICT(MODEL <m>, INPUT { SELECT … }) AS ?out`. */
  def mlPredict: Parser[(String, Select, String)] =
    "ML.PREDICT" ~> "(" ~> kw("MODEL") ~> iri ~ ("," ~> kw("INPUT") ~> "{" ~>
      selectQuery <~ "}") ~ (")" ~> kw("AS") ~> varName) ^^ {
      case m ~ q ~ out => (m, q, out)
    }

  /** `RETRIEVE SOME|EVERY LATENT|ACTIVE STREAM ?v FROM <iri> WITH { … }`
    * (`parser.rs:3179-3263`). */
  def retrieveClause: Parser[RetrieveClause] =
    kw("RETRIEVE") ~> (kw("SOME") | kw("EVERY")) ~ (kw("LATENT") | kw("ACTIVE")) ~
      (kw("STREAM") ~> varName) ~ (kw("FROM") ~> iri) ~
      (kw("WITH") ~> "{" ~> triplesBlock <~ "}") ^^ {
      case mode ~ state ~ v ~ from ~ pats =>
        RetrieveClause(mode, state, v, from, pats)
    }

  /** Raw text of a `{ … }` block, braces balanced (the reference's
    * `parse_balanced`/`extract_wrapped_block`, `parser.rs:2404-2425`). */
  private def balancedBlock: Parser[String] = new Parser[String] {
    def apply(in: Input): ParseResult[String] = {
      val source = in.source
      val start = handleWhiteSpace(source, in.offset)
      if (start >= source.length || source.charAt(start) != '{')
        return Failure("`{' expected", in.drop(start - in.offset))
      // braces inside string literals don't count — "val}ue" must not
      // close the block (escape-aware: \" stays inside the literal)
      var depth = 0; var i = start; var end = -1; var inQ = false
      while (i < source.length && end < 0) {
        source.charAt(i) match {
          case '\\' if inQ => i += 1 // skip the escaped char
          case '"' => inQ = !inQ
          case '{' if !inQ => depth += 1
          case '}' if !inQ => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) Failure("unbalanced `{'", in.drop(start - in.offset))
      else Success(source.subSequence(start + 1, end).toString,
        in.drop(end + 1 - in.offset))
    }
  }

  private val lossFns = Set("cross_entropy", "nll", "mse", "binary_cross_entropy", "bce")
  private val optimizers = Set("adam", "sgd")
  private def num: Parser[String] = """-?\d+(\.\d+)?""".r

  private def trainClause: Parser[(String, Any)] =
    kw("LABEL") ~> varName ^^ (("label", _)) |
    kw("TARGET") ~> "{" ~> triplesBlock <~ "}" ^^ (("target", _)) |
    kw("LOSS") ~> """[A-Za-z_]+""".r ^^ (v => ("loss", v.toLowerCase)) |
    kw("OPTIMIZER") ~> """[A-Za-z_]+""".r ^^ (v => ("optimizer", v.toLowerCase)) |
    kw("LEARNING_RATE") ~> num ^^ (("lr", _)) |
    kw("EPOCHS") ~> num ^^ (("epochs", _)) |
    kw("BATCH_SIZE") ~> num ^^ (("batch", _)) |
    kw("SAVE_TO") ~> stringLit ^^ (("save", _))

  /** `TRAIN NEURAL RELATION <pred> { DATA{…}|QUERY{…} LABEL ?l TARGET {…}
    * LOSS … OPTIMIZER … LEARNING_RATE … EPOCHS … BATCH_SIZE … [SAVE_TO "…"] }`
    * (`parser.rs:2391-2503`; required fields mirror the reference's
    * ok_or_else validation — all but SAVE_TO are mandatory). */
  def trainNeuralRelationDecl: Parser[TrainNeuralRelationDecl] =
    kw("TRAIN") ~> kw("NEURAL") ~> kw("RELATION") ~> iri ~ ("{" ~>
      (kw("DATA") ~> balancedBlock ^^ (b => Right(b): Either[String, String]) |
       kw("QUERY") ~> balancedBlock ^^ (b => Left(b): Either[String, String])) ~
      rep(trainClause) <~ "}") ^^ { case pred ~ (src ~ clauses) =>
      val kv = clauses.toMap
      def req[T](k: String, what: String): T = kv.getOrElse(k,
        throw new IllegalArgumentException(s"TRAIN NEURAL RELATION requires $what")).asInstanceOf[T]
      val targets = req[Seq[TriplePattern]]("target", "TARGET { … }")
      require(targets.size == 1, "triple templates must contain exactly one triple")
      val loss = req[String]("loss", "LOSS")
      require(lossFns.contains(loss), s"unknown LOSS: $loss")
      val opt = req[String]("optimizer", "OPTIMIZER")
      require(optimizers.contains(opt), s"unknown OPTIMIZER: $opt")
      TrainNeuralRelationDecl(
        predicate = pred,
        dataSource = src,
        labelVar = req[String]("label", "LABEL"),
        targetTriple = targets.head,
        loss = loss,
        optimizer = opt,
        learningRate = req[String]("lr", "LEARNING_RATE").toDouble,
        epochs = req[String]("epochs", "EPOCHS").toInt,
        batchSize = req[String]("batch", "BATCH_SIZE").toInt,
        savePath = kv.get("save").map(_.asInstanceOf[String]))
    }

  /** `ASK [FROM …] [WHERE] { … }` (extension). */
  def askQuery: Parser[Select] =
    kw("ASK") ~> rep(kw("FROM") ~> (kw("NAMED") ~> iri ^^ (Right(_)) | iri ^^ (Left(_)))) ~
      (opt(kw("WHERE")) ~> groupGraphPattern) ^^ { case froms ~ where =>
      Select(distinct = false, projection = Seq("*"), aggregates = Nil,
        where = where, groupBy = Nil, orderBy = Nil, limit = None, offset = None,
        fromGraphs = froms.collect { case Left(g) => g },
        fromNamed = froms.collect { case Right(g) => g })
    }

  /** `CONSTRUCT { template } [FROM …] WHERE { … }` (extension). */
  def constructQuery: Parser[ConstructOp] =
    kw("CONSTRUCT") ~> ("{" ~> opt(triplesBlock) <~ "}") ~
      rep(kw("FROM") ~> (kw("NAMED") ~> iri ^^ (Right(_)) | iri ^^ (Left(_)))) ~
      (kw("WHERE") ~> groupGraphPattern) ^^ { case tmpl ~ froms ~ where =>
      ConstructOp(tmpl.getOrElse(Nil),
        Select(distinct = false, projection = Seq("*"), aggregates = Nil,
          where = where, groupBy = Nil, orderBy = Nil, limit = None, offset = None,
          fromGraphs = froms.collect { case Left(g) => g },
          fromNamed = froms.collect { case Right(g) => g }))
    }

  /** `DESCRIBE (?v | <iri>)+ [FROM …] [WHERE { … }]` (extension). */
  def describeQuery: Parser[DescribeOp] =
    kw("DESCRIBE") ~> rep1(varName ^^ (Left(_)) | iri ^^ (Right(_))) ~
      rep(kw("FROM") ~> (kw("NAMED") ~> iri ^^ (Right(_)) | iri ^^ (Left(_)))) ~
      opt(opt(kw("WHERE")) ~> groupGraphPattern) ^^ { case targets ~ froms ~ where =>
      DescribeOp(
        vars = targets.collect { case Left(v) => v },
        iris = targets.collect { case Right(i) => i },
        Select(distinct = false, projection = Seq("*"), aggregates = Nil,
          where = where.getOrElse(Nil), groupBy = Nil, orderBy = Nil,
          limit = None, offset = None,
          fromGraphs = froms.collect { case Left(g) => g },
          fromNamed = froms.collect { case Right(g) => g }))
    }

  // ---- entry points ------------------------------------------------------
  def operation: Parser[Operation] =
    rep(prefixDecl) ~> (selectQuery ^^ (SelectOp(_)) | askQuery ^^ (AskOp(_)) |
      constructQuery | describeQuery | update ^^ (UpdateOp(_)))

  private def run[T](p: Parser[T], input: String): T = {
    prefixes = Map.empty
    parseAll(p, input) match {
      case Success(r, _) => r
      case NoSuccess(msg, next) =>
        // annotated snippet + specific-hint heuristics (error_handler.rs)
        throw new SparqlParseException(
          s"SPARQL parse error at line ${next.pos.line}, col ${next.pos.column}: $msg\n" +
            ParseErrors.format(input, next.pos.line, next.pos.column, msg))
      case other => throw new SparqlParseException(s"SPARQL parse error: $other")
    }
  }

  def parseOperation(q: String): Operation = run(operation, q)
  def parseSelect(q: String): Select = parseOperation(q) match {
    case SelectOp(s) => s
    case _ => throw new IllegalArgumentException("not a SELECT query")
  }
  def parseUpdate(q: String): Update = parseOperation(q) match {
    case UpdateOp(u) => u
    case _ => throw new IllegalArgumentException("not an UPDATE")
  }
  def parseRule(q: String): Rule = run(rep(prefixDecl) ~> ruleDef, q)
  def parseRsp(q: String): RspQuery = run(rep(prefixDecl) ~> rspQuery, q)
  def parseModel(q: String): (String, Seq[Int], Seq[String]) =
    run(rep(prefixDecl) ~> modelDecl, q)
  def parseNeuralRelation(q: String): (String, String, Select, Seq[String], String) =
    run(rep(prefixDecl) ~> neuralRelationDecl, q)
  def parseMlPredict(q: String): (String, Select, String) =
    run(rep(prefixDecl) ~> mlPredict, q)
  def parseTrainNeuralRelation(q: String): TrainNeuralRelationDecl =
    run(rep(prefixDecl) ~> trainNeuralRelationDecl, q)
  def parseRetrieve(q: String): RetrieveClause =
    run(rep(prefixDecl) ~> retrieveClause, q)
}

object SparqlParser {
  def apply(): SparqlParser = new SparqlParser
  def select(q: String): Ast.Select = new SparqlParser().parseSelect(q)
  def operation(q: String): Ast.Operation = new SparqlParser().parseOperation(q)
}
