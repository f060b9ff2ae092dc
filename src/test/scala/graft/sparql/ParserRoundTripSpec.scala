package graft.sparql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import Ast._

/** Property-based parser↔printer round trip over the supported SELECT
  * fragment (SURVEY §5 strategy item (c)): for generated ASTs `a`,
  * `parse(print(a))` must succeed, and `parse ∘ print` must be a FIXPOINT
  * from there on — `parse(print(parse(print(a)))) == parse(print(a))`.
  * The single normalization the grammar performs (adjacent BGPs merge
  * into one `triplesBlock`) happens in the first parse, so the fixpoint
  * formulation checks printer/parser agreement without demanding
  * print∘parse be the identity on arbitrary ASTs.
  *
  * Pure parser test — no SparkSession — so 1000 cases stay cheap. */
class ParserRoundTripSpec extends AnyFunSuite {

  private val nameGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val iriGen: Gen[String] = for {
    host <- nameGen
    path <- nameGen
  } yield s"http://$host.org/$path"

  // lexical forms incl. the characters the escaper must handle
  private val litGen: Gen[String] = Gen.oneOf(
    nameGen,
    Gen.numStr.map(_.take(6)),
    nameGen.map(n => s"$n \"quoted\""),
    nameGen.map(n => s"back\\slash $n"),
    nameGen.map(n => s"multi\nline\t$n"),
    Gen.const("42"), Gen.const("3.14"), Gen.const("true"))

  private val termGen: Gen[Term] = Gen.frequency(
    4 -> nameGen.map(Var(_)),
    3 -> iriGen.map(Iri(_)),
    3 -> litGen.map(Lit(_)),
    1 -> nameGen.map(BNode(_)),
    1 -> (for { s <- nameGen; p <- iriGen; o <- litGen }
      yield Quoted(Var(s), Iri(p), Lit(o))))

  private val patternGen: Gen[TriplePattern] = for {
    s <- termGen; p <- Gen.oneOf(nameGen.map(Var(_): Term), iriGen.map(Iri(_): Term))
    o <- termGen
  } yield TriplePattern(s, p, o)

  private val bgpGen: Gen[Element] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, patternGen)).map(Bgp(_))

  private val exprGen: Gen[Expr] = {
    val leaf = Gen.oneOf(nameGen.map(v => ETerm(Var(v)): Expr),
      litGen.map(l => ETerm(Lit(l)): Expr))
    Gen.frequency(
      5 -> leaf,
      2 -> (for { op <- Gen.oneOf("+", "-", "*", "/"); l <- leaf; r <- leaf }
        yield Arith(op, l, r)),
      1 -> Gen.listOfN(2, leaf).map(as => Func("CONCAT", as)))
  }

  private val condGen: Gen[Condition] = {
    val cmp = for {
      op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
      l <- exprGen; r <- exprGen
    } yield Cmp(op, l, r): Condition
    Gen.frequency(
      5 -> cmp,
      1 -> (for { a <- cmp; b <- cmp } yield And(a, b): Condition),
      1 -> (for { a <- cmp; b <- cmp } yield Or(a, b): Condition),
      1 -> cmp.map(Not(_): Condition),
      1 -> nameGen.map(v => CondFunc("ISTRIPLE", Seq(ETerm(Var(v)))): Condition))
  }

  private val valuesGen: Gen[Element] = for {
    nVars <- Gen.choose(1, 2)
    vars <- Gen.listOfN(nVars, nameGen)
    nRows <- Gen.choose(1, 3)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nVars, Gen.frequency(
      3 -> termGen.map(Some(_): Option[Term]),
      1 -> Gen.const(None: Option[Term]))))
  } yield ValuesElem(vars, rows)

  private val simpleElemGen: Gen[Element] = Gen.frequency(
    5 -> bgpGen,
    2 -> condGen.map(FilterElem(_)),
    2 -> (for { e <- exprGen; v <- nameGen } yield BindElem(e, v)),
    1 -> valuesGen,
    1 -> (for {
      g <- Gen.oneOf(iriGen.map(GraphIri(_): GraphSpec), nameGen.map(GraphVar(_): GraphSpec))
      inner <- bgpGen
    } yield GraphBlock(g, Seq(inner))),
    1 -> (for {
      b1 <- bgpGen; b2 <- bgpGen
    } yield UnionBlock(Seq(Seq(b1), Seq(b2)))),
    // extensions: OPTIONAL / MINUS / FILTER [NOT] EXISTS / property paths
    1 -> bgpGen.map(b => OptionalBlock(Seq(b)): Element),
    1 -> bgpGen.map(b => MinusBlock(Seq(b)): Element),
    1 -> (for { b <- bgpGen; neg <- Gen.oneOf(true, false) }
      yield FilterElem(ExistsCond(Seq(b), neg)): Element),
    1 -> (for { s <- nameGen; p <- pathGen; o <- nameGen }
      yield PathPattern(Var(s), p, Var(o)): Element))

  private lazy val pathGen: Gen[Path] = {
    val link = iriGen.map(PLink(_): Path)
    Gen.frequency(
      3 -> link,
      1 -> link.map(PInv(_): Path),
      1 -> (for { a <- link; b <- link } yield PSeq(a, b): Path),
      1 -> (for { a <- link; b <- link } yield PAlt(a, b): Path),
      1 -> link.map(POneOrMore(_): Path),
      1 -> link.map(PZeroOrMore(_): Path),
      1 -> link.map(PZeroOrOne(_): Path),
      1 -> (for {
        nFwd <- Gen.choose(0, 2)
        fwd <- Gen.listOfN(nFwd, iriGen)
        nInv <- Gen.choose(if (nFwd == 0) 1 else 0, 2)
        inv <- Gen.listOfN(nInv, iriGen)
      } yield PNeg(fwd, inv): Path))
  }

  private def selectGen(depth: Int): Gen[Select] = for {
    distinct <- Gen.oneOf(true, false)
    star <- Gen.frequency(1 -> true, 2 -> false)
    nProj <- Gen.choose(1, 3)
    proj <- Gen.listOfN(nProj, nameGen)
    nAggs <- Gen.frequency(3 -> 0, 1 -> 1)
    aggs <- Gen.listOfN(nAggs, for {
      f <- Gen.oneOf("SUM", "MIN", "MAX", "AVG", "COUNT")
      v <- if (f == "COUNT") Gen.frequency(1 -> Gen.const(None), 2 -> nameGen.map(Some(_)))
           else nameGen.map(Some(_))
      a <- nameGen
      d <- Gen.oneOf(true, false)
    } yield Aggregate(f, v, a, distinct = d && v.isDefined))
    nElems <- Gen.choose(1, 3)
    elems <- Gen.listOfN(nElems, simpleElemGen)
    sub <- if (depth > 0) Gen.frequency(3 -> Gen.const(Nil),
      1 -> selectGen(depth - 1).map(s => Seq(SubSelect(s): Element)))
      else Gen.const(Nil)
    groupBy <- if (aggs.nonEmpty) Gen.listOfN(1, nameGen) else Gen.const(Nil)
    having <- if (aggs.isEmpty) Gen.const(Nil)
      else Gen.frequency(2 -> Gen.const(Nil),
        1 -> (for {
          f <- Gen.oneOf("SUM", "MIN", "MAX", "AVG", "COUNT")
          arg <- if (f == "COUNT")
              Gen.frequency(1 -> Gen.const(Seq.empty[Expr]),
                2 -> nameGen.map(v => Seq(ETerm(Var(v)): Expr)))
            else nameGen.map(v => Seq(ETerm(Var(v)): Expr))
          op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
          n <- Gen.choose(0, 999)
        } yield Seq(Cmp(op, Func(f, arg), ETerm(Lit(n.toString))): Condition)))
    orderBy <- Gen.frequency(2 -> Gen.const(Nil),
      1 -> (for { v <- nameGen; asc <- Gen.oneOf(true, false) }
        yield Seq(OrderKey(v, asc))))
    limit <- Gen.frequency(2 -> Gen.const(None), 1 -> Gen.choose(0, 99).map(Some(_)))
    offset <- Gen.frequency(3 -> Gen.const(None), 1 -> Gen.choose(0, 9).map(Some(_)))
    froms <- Gen.frequency(3 -> Gen.const(Nil), 1 -> Gen.listOfN(1, iriGen))
    fromNamed <- Gen.frequency(3 -> Gen.const(Nil), 1 -> Gen.listOfN(1, iriGen))
  } yield Select(
    distinct = distinct,
    projection = if (star && aggs.isEmpty) Seq("*") else proj,
    aggregates = if (star) Nil else aggs,
    where = elems ++ sub,
    groupBy = if (star) Nil else groupBy,
    orderBy = orderBy, limit = limit, offset = offset,
    fromGraphs = froms, fromNamed = fromNamed,
    having = if (star) Nil else having)

  private val windowGen: Gen[WindowSpec] = for {
    iri <- iriGen
    stream <- Gen.frequency(2 -> iriGen, 1 -> Gen.const("*"))
    range <- Gen.choose(1L, 10000L)
    step <- Gen.choose(1L, 10000L)
  } yield WindowSpec(iri, stream, range, step)

  private val rspGen: Gen[RspQuery] = for {
    kind <- Gen.oneOf(RStream, IStream, DStream)
    out <- iriGen
    nWin <- Gen.choose(1, 2)
    windows <- Gen.listOfN(nWin, windowGen)
    blocks <- Gen.sequence[Seq[Element], Element](windows.map(w =>
      Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, Gen.frequency(
          4 -> bgpGen, 1 -> condGen.map(FilterElem(_)))))
        .map(els => WindowBlockElem(w.iri, els): Element)))
    policy <- Gen.frequency(3 -> Gen.const(None),
      1 -> Gen.oneOf(WaitPolicy, StealPolicy, TimeoutPolicy(500L, fallbackSteal = true),
        TimeoutPolicy(250L, fallbackSteal = false)).map(Some(_)))
    star <- Gen.oneOf(true, false)
    proj <- Gen.listOfN(2, nameGen)
    // the r6 modifier tail: aggregates + GROUP BY + HAVING + ORDER/LIMIT
    // (printRsp used to drop everything after GROUP BY — review finding)
    withAgg <- Gen.oneOf(true, false)
    aggVar <- nameGen
    aggAlias <- nameGen.suchThat(_ != aggVar)
    groupVar <- nameGen
    havingN <- Gen.choose(1, 5)
    withOrder <- Gen.oneOf(true, false)
    limit <- Gen.frequency(2 -> Gen.const(None), 1 -> Gen.choose(1, 9).map(Some(_)))
  } yield {
    val aggs = if (withAgg && !star)
      Seq(Aggregate("COUNT", Some(aggVar), aggAlias)) else Nil
    RspQuery(kind, out, windows,
      Select(distinct = false,
        projection = if (star) Seq("*") else proj,
        aggregates = aggs, where = blocks,
        groupBy = if (aggs.nonEmpty) Seq(groupVar) else Nil,
        having = if (aggs.nonEmpty)
          Seq(Cmp(">=", ETerm(Var(aggAlias)), ETerm(Lit(havingN.toString))))
        else Nil,
        orderBy = if (withOrder && aggs.nonEmpty)
          Seq(OrderKey(aggAlias, asc = true)) else Nil,
        limit = if (aggs.nonEmpty) limit else None,
        offset = None, fromGraphs = Nil, fromNamed = Nil),
      policy = policy)
  }

  test("RSP-QL REGISTER parse ∘ print ∘ parse fixpoint holds for 300 generated queries") {
    val parser = SparqlParser()
    var checked = 0
    val seedLong = 0xCAFE5L
    while (checked < 300) {
      rspGen(Gen.Parameters.default, Seed(seedLong + checked)) match {
        case Some(ast) =>
          val text1 = SparqlPrinter.printRsp(ast)
          val p1 = try parser.parseRsp(text1) catch {
            case e: Exception => fail(s"print of generated RSP AST failed to parse: " +
              s"${e.getMessage}\nAST: $ast\nTEXT: $text1")
          }
          val text2 = SparqlPrinter.printRsp(p1)
          val p2 = parser.parseRsp(text2)
          assert(p2 == p1,
            s"RSP parse∘print not a fixpoint:\nfirst:  $p1\nsecond: $p2\ntext: $text2")
          checked += 1
        case None => checked += 1
      }
    }
  }

  test("parse ∘ print ∘ parse fixpoint holds for 1000 generated queries") {
    val gen = selectGen(1)
    var checked = 0
    val seedLong = 0x5EED5L // deterministic base seed
    while (checked < 1000) {
      val seed = Seed(seedLong + checked)
      gen(Gen.Parameters.default, seed) match {
        case Some(ast) =>
          val text1 = SparqlPrinter.printSelect(ast)
          val p1 = try SparqlParser.select(text1) catch {
            case e: Exception => fail(s"print of generated AST failed to parse: " +
              s"${e.getMessage}\nAST: $ast\nTEXT: $text1")
          }
          val text2 = SparqlPrinter.printSelect(p1)
          val p2 = try SparqlParser.select(text2) catch {
            case e: Exception => fail(s"fixpoint reparse failed: ${e.getMessage}\nTEXT: $text2")
          }
          assert(p2 == p1,
            s"parse∘print not a fixpoint:\nfirst:  $p1\nsecond: $p2\ntext: $text2")
          checked += 1
        case None => checked += 1 // generator discard (rare) — skip
      }
    }
  }
}
