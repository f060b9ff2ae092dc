package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.rdfio.RdfIO
import graft.sparql.Compiler

/** Unified engine facade — the reference's `QueryEngine`
  * (`kolibrie/src/query_engine.rs:15-120`): load triples into the store,
  * run a query, `explain` how it would execute (static vs streaming
  * routing + window clauses), and report storage stats. The Spark twin
  * extends `explain` with the Catalyst plan — the part the reference's
  * Volcano flag stands in for.
  */
object QueryEngine {

  sealed trait StorageMode
  case object Static extends StorageMode
  case object Streaming extends StorageMode
  case object Hybrid extends StorageMode

  /** `query_engine.rs:98-112` — routing decision + window clauses; the
    * Catalyst logical plan replaces `will_use_volcano`'s optimizer hint
    * (every static query runs through Catalyst here). */
  final case class QueryExplanation(
      storageMode: StorageMode,
      usesCatalyst: Boolean,
      hasWindowing: Boolean,
      windowClauses: Seq[String],
      catalystPlan: Option[String])

  final case class QueryEngineStats(memoryTripleCount: Long)

  /** The reference's windowing-keyword sniff (`query_engine.rs:118-140`)
    * — consciously FIXED rather than preserved (§7.5 discipline): the
    * reference's bare substring check classifies any query mentioning
    * `rdfs:range` (or a ?range variable, or RANGE inside an IRI) as
    * streaming. Keywords here must appear as standalone words outside
    * IRIs/string literals and not as `pfx:local` locals or variables. */
  private val windowingKeywords = Seq("WINDOW", "FROM NAMED WINDOW", "SLIDING",
    "TUMBLING", "RANGE", "RSTREAM", "ISTREAM", "DSTREAM", "SLIDE")

  private[model] def hasWindowingOperations(q: String): Boolean = {
    val stripped = q.replaceAll("<[^>]*>", " ")
      .replaceAll("\"(?:[^\"\\\\]|\\\\.)*\"", " ").toUpperCase
    windowingKeywords.exists(k =>
      ("(?<![:?$\\w])" + java.util.regex.Pattern.quote(k) + "(?!\\w)").r
        .findFirstIn(stripped).isDefined)
  }

  private[model] def isRspQlQuery(q: String): Boolean = {
    val upper = q.toUpperCase
    upper.contains("REGISTER") && (upper.contains("RSTREAM") ||
      upper.contains("ISTREAM") || upper.contains("DSTREAM"))
  }

  private[model] def extractWindowClauses(q: String): Seq[String] =
    "(?i)FROM\\s+NAMED\\s+WINDOW\\s+\\S+\\s+ON\\s+\\S+\\s*\\[[^\\]]*\\]".r
      .findAllIn(q).toSeq
}

class QueryEngine(val spark: SparkSession) {
  import QueryEngine._

  val store: QuadStore = QuadStore.empty(spark)

  /** Parse an N-Triples document string into the in-memory store
    * (`load_ntriples_to_memory`, `query_engine.rs:32-51`). */
  def loadNTriplesToMemory(data: String): Unit =
    store.insert(QuadStore.align(spark,
      spark.createDataFrame(RdfIO.parseNtDoc(data).map {
        case (s, p, o) => (null.asInstanceOf[String], s, p, o)
      }).toDF("g", "s", "p", "o")))

  def addTripleToMemory(s: String, p: String, o: String): Unit = {
    import spark.implicits._
    store.insert(QuadStore.align(spark,
      Seq((null.asInstanceOf[String], s, p, o)).toDF("g", "s", "p", "o")))
  }

  def queryDf(sparql: String): DataFrame = new Compiler(store).execute(sparql)

  /** Row-of-strings result shape (`query_engine.rs:62-67` returns
    * `Vec<Vec<String>>`). */
  def query(sparql: String): Seq[Seq[String]] =
    queryDf(sparql).collect().toSeq.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse("")))

  def explain(sparql: String): QueryExplanation = {
    val windowing = hasWindowingOperations(sparql)
    val mode = if (windowing || isRspQlQuery(sparql)) Streaming else Static
    // COMPILE only, never execute: explain("DELETE WHERE ...") must not
    // mutate the store (Compiler.execute runs updates eagerly)
    val plan = mode match {
      case Static =>
        graft.sparql.SparqlParser.operation(sparql) match {
          case graft.sparql.Ast.SelectOp(sel) =>
            Some(new Compiler(store).compileSelect(sel)
              .queryExecution.optimizedPlan.toString)
          case _ => None // updates/other forms: routing info only
        }
      case _ => None
    }
    QueryExplanation(
      storageMode = mode,
      usesCatalyst = mode != Streaming,
      hasWindowing = windowing,
      windowClauses = extractWindowClauses(sparql),
      catalystPlan = plan)
  }

  def stats: QueryEngineStats =
    QueryEngineStats(store.quads.filter(store.quads("g").isNull).count())
}
