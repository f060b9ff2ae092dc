package graft.rdfio

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{QuadStore, TermLex}

/** RDF readers/writers (SURVEY §2.1) rebuilt as Spark sources/sinks.
  *
  * N-Triples and N-Quads lines are independent, so parsing is a
  * `mapPartitions` over `spark.read.text` — embarrassingly parallel over
  * input splits, the same shape at 100 TB (the reference parallelizes with
  * rayon chunking, `sparql_database.rs:1335-1461`). Turtle statements span
  * lines (`;`/`,` continuations, `{| … |}` annotations), so Turtle and
  * RDF/XML parse per-file (`wholetext`), parallel across files.
  *
  * Malformed lines are skipped, matching the reference's lenient line
  * parsers.
  */
object RdfIO {

  val tripleSchema: StructType = StructType(Seq(
    StructField("s", StringType), StructField("p", StringType),
    StructField("o", StringType)))
  val quadSchema: StructType = StructType(Seq(
    StructField("g", StringType), StructField("s", StringType),
    StructField("p", StringType), StructField("o", StringType)))

  // ---- N-Triples(-star) --------------------------------------------------

  private def parseNtLine(line: String): Option[(String, String, String, Option[String])] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    try {
      val p = new RdfTermParser(t)
      val su = p.term(); val pr = p.term(); val ob = p.term()
      // optional 4th term (N-Quads); then '.'
      p.skipWs()
      val g = if (!p.eof && p.peek != '.') Some(p.term()) else None
      Some((su, pr, ob, g))
    } catch { case _: Exception => None }
  }

  /** Parse an in-memory N-Triples document (HTTP payloads — the
    * reference's `parse_ntriples_and_add`, `sparql_database.rs:1335-1342`). */
  def parseNtDoc(doc: String): Seq[(String, String, String)] =
    doc.linesIterator.flatMap(l => parseNtLine(l).map(t => (t._1, t._2, t._3))).toSeq

  def readNTriples(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).mapPartitions(_.flatMap(l =>
      parseNtLine(l).map(t => (t._1, t._2, t._3)))).toDF("s", "p", "o")
  }

  def readNQuads(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).mapPartitions(_.flatMap(l =>
      parseNtLine(l).map(t => (t._4.orNull, t._1, t._2, t._3)))).toDF("g", "s", "p", "o")
  }

  // ---- Turtle(-star) -----------------------------------------------------

  /** Turtle fragment matching the reference's tokenizer
    * (`sparql_database.rs:965-1247`): @prefix, `;`/`,`/`.` continuations,
    * `a`, RDF-star `<< >>` terms, and `{| p o |}` annotation syntax
    * (annotation on triple t asserts t and `<<t>> p o`). */
  /** A quote at `j` is escaped iff preceded by an ODD run of backslashes
    * — `\\"` is an escaped backslash followed by a REAL closing quote
    * (the naive `charAt(j-1) != '\\'` check left inQ stuck open). */
  private def quoteEscaped(s: CharSequence, j: Int): Boolean = {
    var k = j - 1; var n = 0
    while (k >= 0 && s.charAt(k) == '\\') { n += 1; k -= 1 }
    n % 2 == 1
  }

  def parseTurtleDoc(doc: String): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var prefixes = Map.empty[String, String]
    // strip comments (# outside quotes AND outside <…> IRIs — datatype
    // IRIs like xsd#integer carry fragments), join logical statements on '.'
    val cleaned = doc.linesIterator.map { l =>
      var inQ = false; var inIri = false
      val sb = new StringBuilder
      var j = 0
      while (j < l.length) {
        val c = l.charAt(j)
        if (c == '"' && !inIri && !quoteEscaped(l, j)) inQ = !inQ
        if (c == '<' && !inQ) inIri = true
        if (c == '>' && !inQ) inIri = false
        if (c == '#' && !inQ && !inIri) j = l.length
        else { sb += c; j += 1 }
      }
      sb.toString
    }.mkString("\n")

    // statement-level split on '.' at depth 0 outside quotes
    val statements = scala.collection.mutable.ArrayBuffer.empty[String]
    locally {
      var depth = 0; var inQ = false; var inIri = false
      val sb = new StringBuilder
      var j = 0
      while (j < cleaned.length) {
        val c = cleaned.charAt(j)
        c match {
          case '"' if !inIri && !quoteEscaped(cleaned, j) =>
            inQ = !inQ; sb += c
          case '<' if !inQ && cleaned.startsWith("<<", j) => depth += 1; sb ++= "<<"; j += 1
          case '>' if !inQ && cleaned.startsWith(">>", j) => depth -= 1; sb ++= ">>"; j += 1
          case '<' if !inQ => inIri = true; sb += c
          case '>' if !inQ && inIri => inIri = false; sb += c
          case '{' if !inQ && cleaned.startsWith("{|", j) => depth += 1; sb ++= "{|"; j += 1
          case '|' if !inQ && cleaned.startsWith("|}", j) => depth -= 1; sb ++= "|}"; j += 1
          case '.' if !inQ && !inIri && depth == 0 &&
            // a '.' inside a decimal number is not a statement end
            !(j > 0 && cleaned.charAt(j - 1).isDigit && j + 1 < cleaned.length &&
              cleaned.charAt(j + 1).isDigit) =>
            statements += sb.toString; sb.clear()
          case c2 => sb += c2
        }
        j += 1
      }
      if (sb.toString.trim.nonEmpty) statements += sb.toString
    }

    def process(st0: String): Unit = {
      val st = st0.trim
      if (st.isEmpty) return
      if (st.startsWith("@prefix") || st.toLowerCase.startsWith("prefix")) {
        val body = st.replaceFirst("(?i)@?prefix", "").trim
        val sp = body.indexOf(':')
        val pfx = body.substring(0, sp + 1).trim
        val iriStart = body.indexOf('<', sp)
        val iriEnd = body.indexOf('>', iriStart)
        if (iriStart >= 0 && iriEnd > iriStart) {
          prefixes += (pfx -> body.substring(iriStart + 1, iriEnd))
          // a SPARQL-style PREFIX has no trailing '.', so the '.'-split
          // merges it with the NEXT statement — recurse on the remainder
          // instead of silently dropping it (review finding)
          process(body.substring(iriEnd + 1))
        }
      } else {
        try {
          val p = new RdfTermParser(st.replace('\n', ' '))
          p.prefixes = prefixes
          val subj = p.term()
          var done = false
          while (!done) {
            val pred = p.term()
            var more = true
            while (more) {
              val obj = p.term()
              out += ((subj, pred, obj))
              // annotation: {| ap ao ; ... |} on the triple just emitted
              if (p.tryConsume("{|")) {
                val qt = TermLex.encodeQuoted(subj, pred, obj)
                var annMore = true
                while (annMore) {
                  val ap = p.term()
                  var objMore = true
                  while (objMore) {
                    val ao = p.term()
                    out += ((qt, ap, ao))
                    objMore = p.tryConsume(",")
                  }
                  annMore = p.tryConsume(";") && { p.skipWs(); !p.eof && p.peek != '|' }
                }
                p.tryConsume("|}")
              }
              more = p.tryConsume(",")
            }
            if (p.tryConsume(";")) { p.skipWs(); done = p.eof }
            else done = true
          }
        } catch { case _: Exception => /* lenient: skip malformed statement */ }
      }
    }
    statements.foreach(process)
    out.toSeq
  }

  def readTurtle(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(parseTurtleDoc).toDF("s", "p", "o")
  }

  // ---- N3 ----------------------------------------------------------------

  /** N3 reader (`sparql_database.rs:1264-1332` parse_n3): the reference's
    * N3 support is @prefix declarations plus the same whitespace-token
    * statement grammar (`;`/`,` continuations, `.` terminator, typed and
    * lang-tagged literals) its Turtle path lowers to
    * (`parse_statement`, `sparql_database.rs:1658-1717`), so the Turtle
    * document parser covers the accepted subset. N3-only constructs the
    * reference does not implement (formulae `{}`, `=>` implication) are
    * likewise out of scope. */
  def readN3(spark: SparkSession, path: String): DataFrame =
    readTurtle(spark, path)

  // ---- RDF/XML -----------------------------------------------------------

  private val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** RDF/XML subset the reference's SAX parser handles
    * (`sparql_database.rs:630-963`): rdf:Description / typed node elements
    * with rdf:about, property elements with rdf:resource or text content,
    * one level of nested node elements (fresh blank nodes). */
  def parseRdfXmlDoc(doc: String): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val root = scala.xml.XML.loadString(doc)
    var bnodeN = 0
    def nodeSubject(e: scala.xml.Elem): String = {
      val about = e.attributes.collectFirst {
        case a: scala.xml.Attribute if a.key == "about" => a.value.text
      }
      about.getOrElse { bnodeN += 1; s"_:b$bnodeN" }
    }
    def expand(e: scala.xml.Elem): String = {
      val ns = e.namespace
      if (ns == null) e.label else ns + e.label
    }
    def walkNode(e: scala.xml.Elem): String = {
      val subj = nodeSubject(e)
      val tpe = expand(e)
      if (tpe != rdfNs + "Description") out += ((subj, rdfNs + "type", tpe))
      e.child.foreach {
        case pe: scala.xml.Elem =>
          val pred = expand(pe)
          val res = pe.attributes.collectFirst {
            case a: scala.xml.Attribute if a.key == "resource" => a.value.text
          }
          res match {
            case Some(r) => out += ((subj, pred, r))
            case None =>
              val nested = pe.child.collect { case c: scala.xml.Elem => c }
              if (nested.nonEmpty) {
                nested.foreach { n => out += ((subj, pred, walkNode(n))) }
              } else {
                val text = pe.text.trim
                if (text.nonEmpty) out += ((subj, pred, text))
              }
          }
        case _ =>
      }
      subj
    }
    root.child.foreach {
      case e: scala.xml.Elem => walkNode(e)
      case _ =>
    }
    out.toSeq
  }

  /** RDF/XML reader: one XML document per FILE, parsed in the executor
    * that reads it — a directory of documents (e.g. [[writeRdfXmlDir]]
    * output) scales horizontally; a single multi-GB document is the
    * format's own serial limit (matching the reference's scope). Blank
    * files (empty partitions of a distributed write) are skipped. */
  def readRdfXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .filter(length(trim(col("value"))) > 0)
      .flatMap(parseRdfXmlDoc).toDF("s", "p", "o")
  }

  // ---- writers -----------------------------------------------------------

  /** N-Triples(-star) sink: distributed text write, one part per task. */
  def writeNTriples(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    df.select("s", "p", "o").map { r =>
      s"${RdfTermWriter.asResource(r.getString(0))} ${RdfTermWriter.asResource(r.getString(1))} ${RdfTermWriter.write(r.getString(2))} ."
    }.write.mode("overwrite").text(path)
  }

  /** N-Quads sink; default-graph rows (null g) get 3-term lines. */
  def writeNQuads(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    QuadStore.align(df.sparkSession, df).map { r =>
      val base = s"${RdfTermWriter.asResource(r.getString(1))} ${RdfTermWriter.asResource(r.getString(2))} ${RdfTermWriter.write(r.getString(3))}"
      if (r.isNullAt(0)) s"$base ." else s"$base ${RdfTermWriter.asResource(r.getString(0))} ."
    }.write.mode("overwrite").text(path)
  }

  /** Turtle sink: subject-grouped `;` continuations. Quoted-triple
    * subjects serialize as `<< … >>` (Turtle-star). Distributed: grouping
    * is a groupBy on subject, each task writes its partition. */
  def writeTurtle(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    df.select("s", "p", "o").groupBy("s")
      .agg(collect_list(struct(col("p"), col("o"))).as("po"))
      .map { r =>
        val subj = RdfTermWriter.asResource(r.getString(0))
        val pos = r.getSeq[Row](1).map(po =>
          s"${RdfTermWriter.asResource(po.getString(0))} ${RdfTermWriter.write(po.getString(1))}")
        s"$subj ${pos.mkString(" ;\n    ")} ."
      }.write.mode("overwrite").text(path)
  }

  private val RdfXmlHeader = "<?xml version=\"1.0\"?>\n" +
    "<rdf:RDF xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\">"
  private val RdfXmlFooter = "\n</rdf:RDF>"

  /** Per-subject `rdf:Description` elements, property elements namespaced
    * by splitting the predicate IRI at its last `#`/`/` — the reader's
    * ns+label expansion reproduces the original predicate, so write→read
    * round-trips. */
  private def rdfXmlDescriptions(df: DataFrame): org.apache.spark.sql.Dataset[String] = {
    import df.sparkSession.implicits._
    def esc(v: String) = v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    // the local part becomes an XML element name, so it must be a valid
    // NCName: split at the longest NCName suffix (a '#'/'/' split alone
    // emitted `<2020 …>` for http://ex/2020 — unparseable XML that killed
    // the whole part file's round-trip, review finding)
    def isNCChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '-' || c == '.'
    def isNCStart(c: Char) = c.isLetter || c == '_'
    def splitIri(p: String): (String, String) = {
      var st = p.length
      while (st > 0 && isNCChar(p.charAt(st - 1))) st -= 1
      while (st < p.length && !isNCStart(p.charAt(st))) st += 1
      if (st >= p.length)
        throw new IllegalArgumentException(
          s"predicate IRI '$p' has no XML-name local part — not serializable as RDF/XML")
      if (st == 0) ("urn:graft:", p) else (p.substring(0, st), p.substring(st))
    }
    df.select("s", "p", "o").groupBy("s")
      .agg(collect_list(struct(col("p"), col("o"))).as("po"))
      .map { r =>
        val props = r.getSeq[Row](1).map { po =>
          val (p, o) = (po.getString(0), po.getString(1))
          val (ns, local) = splitIri(p)
          if (RdfTermWriter.isIriLike(o))
            s"""    <$local xmlns="${esc(ns)}" rdf:resource="${esc(o)}"/>"""
          else s"""    <$local xmlns="${esc(ns)}">${esc(o)}</$local>"""
        }
        s"""  <rdf:Description rdf:about="${esc(r.getString(0))}">\n${props.mkString("\n")}\n  </rdf:Description>"""
      }
  }

  /** RDF/XML sink, single document (collected) — the reference's
    * serializer scope (`sparql_database.rs:457-628`). For corpora that
    * exceed one document, use [[writeRdfXmlDir]]. */
  def writeRdfXml(df: DataFrame, path: String): Unit = {
    val rows = rdfXmlDescriptions(df).collect()
    val doc = RdfXmlHeader + "\n" + rows.mkString("\n") + RdfXmlFooter
    val p = new java.io.PrintWriter(path)
    try p.write(doc) finally p.close()
  }

  /** DISTRIBUTED RDF/XML sink: one complete, valid RDF/XML document per
    * partition, written as a directory of part files — no driver
    * collect, scales with the corpus. Subjects are grouped (all of a
    * subject's properties land in one document); [[readRdfXml]] over the
    * directory reads every part in parallel. This is the Spark-native
    * answer to the format's one-document-one-parser constraint: shard
    * into many documents, not one giant one. */
  def writeRdfXmlDir(df: DataFrame, path: String,
      /** Force a document count (default: one per post-aggregation
        * partition — AQE may coalesce small corpora to one). */
      numDocs: Option[Int] = None): Unit = {
    import df.sparkSession.implicits._
    val descs = rdfXmlDescriptions(df)
    numDocs.fold(descs)(n => descs.repartition(n))
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else Iterator.single(RdfXmlHeader + "\n" + it.mkString("\n") + RdfXmlFooter)
      }
      .write.mode("overwrite").text(path)
  }

  // ---- store builders ----------------------------------------------------

  def storeFromNTriples(spark: SparkSession, path: String): QuadStore =
    QuadStore(spark, readNTriples(spark, path))
  def storeFromNQuads(spark: SparkSession, path: String): QuadStore =
    QuadStore(spark, readNQuads(spark, path))
  def storeFromTurtle(spark: SparkSession, path: String): QuadStore =
    QuadStore(spark, readTurtle(spark, path))
  def storeFromRdfXml(spark: SparkSession, path: String): QuadStore =
    QuadStore(spark, readRdfXml(spark, path))
}
