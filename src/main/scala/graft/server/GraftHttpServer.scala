package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import graft.model.QuadStore
import graft.rdfio.RdfIO
import graft.reasoner.Reasoner
import graft.sparql.{Compiler, SparqlParser}

/** Thin SPARQL-over-HTTP protocol endpoint — the Spark counterpart of the
  * reference's `kolibrie-http-server` (`src/main.rs:598-623` routing,
  * `main.rs:896-1125` execute_sparql_with_context).
  *
  * Routes:
  *  - `POST /query` with JSON `{sparql | queries, rule | rules, rdf,
  *    format}`: loads the payload RDF (ntriples / turtle / rdfxml) into a
  *    fresh store — or queries the server's base store when no `rdf` is
  *    given — applies the RULE definitions via the forward-chaining
  *    reasoner, executes each query, and answers
  *    `{"results":[{query_index, query, data, execution_time_ms}]}` with
  *    `data` rows as `[var, value]` pair arrays (the reference's
  *    `Vec<(String, String)>` row shape).
  *  - `GET /query?query=…` (URL-encoded) against the base store.
  *  - `OPTIONS` answers CORS preflight like the reference.
  *
  * Uses the JDK's `com.sun.net.httpserver` and Spark's bundled Jackson —
  * no new dependencies. The RSP session routes (`/rsp/register`,
  * `/rsp/push`) are out of scope this round; the RSP engine itself is
  * exercised through [[graft.streaming.RspEngine]].
  */
class GraftHttpServer(spark: SparkSession, base: Option[QuadStore] = None) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  def start(requestedPort: Int = 0): this.type = {
    server = HttpServer.create(new InetSocketAddress(requestedPort), 0)
    server.createContext("/query", queryHandler)
    server.createContext("/rsp-query", rspQueryHandler)
    server.setExecutor(null) // single-threaded dispatcher; Spark parallelizes inside
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def queryHandler: HttpHandler = (exchange: HttpExchange) =>
    try {
      exchange.getRequestMethod match {
        case "OPTIONS" => respond(exchange, 204, "")
        case "GET" =>
          val params = Option(exchange.getRequestURI.getRawQuery).getOrElse("")
            .split("&").filter(_.contains("=")).map { kv =>
              val Array(k, v) = kv.split("=", 2)
              k -> java.net.URLDecoder.decode(v, "UTF-8")
            }.toMap
          params.get("query") match {
            case Some(q) => respond(exchange, 200,
              runQueries(Seq(q), Nil, None, "ntriples").toString)
            case None => respond(exchange, 400, error("No queries provided"))
          }
        case "POST" =>
          val body = new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val parsed: Either[String, JsonNode] =
            try Right(mapper.readTree(body))
            catch { case e: Exception => Left(s"Invalid JSON: ${e.getMessage}") }
          parsed match {
            case Left(msg) => respond(exchange, 400, error(msg))
            case Right(req) =>
              def strings(single: String, multi: String): Seq[String] = {
                val one = Option(req.get(single)).filter(!_.isNull).map(_.asText()).toSeq
                val many = Option(req.get(multi)).filter(_.isArray).toSeq
                  .flatMap(a => (0 until a.size()).map(a.get(_).asText()))
                one ++ many
              }
              val queries = strings("sparql", "queries")
              if (queries.isEmpty) respond(exchange, 400, error("No queries provided"))
              else {
                val rules = strings("rule", "rules")
                val rdf = Option(req.get("rdf")).filter(!_.isNull)
                  .map(_.asText()).filter(_.trim.nonEmpty)
                val format = Option(req.get("format")).filter(!_.isNull)
                  .map(_.asText()).getOrElse("rdfxml")
                respond(exchange, 200, runQueries(queries, rules, rdf, format).toString)
              }
          }
        case _ => respond(exchange, 404, error("Not Found"))
      }
    } catch {
      case e: Exception => respond(exchange, 500, error(e.getMessage))
    }

  /** `POST /rsp-query` (`main.rs:1127-1260` execute_rsp_query): one-shot
    * RSP run — `{query, events: [{stream, timestamp, ntriples}],
    * static_rdf?, static_format?}` → feed events in timestamp order,
    * flush pending windows, answer
    * `{"data": [headers, row…], "total_results", "execution_time_ms"}`. */
  private def rspQueryHandler: HttpHandler = (exchange: HttpExchange) =>
    try {
      exchange.getRequestMethod match {
        case "OPTIONS" => respond(exchange, 204, "")
        case "POST" =>
          val body = new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val parsed: Either[String, JsonNode] =
            try Right(mapper.readTree(body))
            catch { case e: Exception => Left(s"Invalid JSON: ${e.getMessage}") }
          parsed match {
            case Left(msg) => respond(exchange, 400, error(msg))
            case Right(req) if req.get("query") == null || req.get("query").isNull =>
              respond(exchange, 400, error("No query provided"))
            case Right(req) =>
              val t0 = System.nanoTime()
              val staticRdf = Option(req.get("static_rdf")).filter(!_.isNull)
                .map(_.asText()).filter(_.trim.nonEmpty)
              val staticFormat = Option(req.get("static_format")).filter(!_.isNull)
                .map(_.asText()).getOrElse("rdfxml")
              val staticStore = staticRdf.map(_ => buildStore(staticRdf, staticFormat))
              val engine = graft.streaming.RspEngineBuilder.fromQuery(
                spark, req.get("query").asText(), staticStore)
              val events = Option(req.get("events")).filter(_.isArray).toSeq
                .flatMap(a => (0 until a.size()).map(a.get))
                .sortBy(_.get("timestamp").asLong())
              events.foreach { e =>
                val ts = e.get("timestamp").asLong()
                val stream = e.get("stream").asText()
                RdfIO.parseNtDoc(e.get("ntriples").asText()).foreach {
                  case (s, p, o) => engine.add(stream, s, p, o, ts)
                }
              }
              engine.flush()
              // first-seen variable order across all emitted rows
              val rows = engine.emissions.flatMap(_.rows)
              val headers = rows.foldLeft(Vector.empty[String])((hs, r) =>
                hs ++ r.keys.filterNot(hs.contains))
              val resp = mapper.createObjectNode()
              val data = resp.putArray("data")
              if (rows.nonEmpty) {
                val hRow = data.addArray()
                headers.foreach(hRow.add)
                rows.foreach { r =>
                  val row = data.addArray()
                  headers.foreach(h => row.add(r.getOrElse(h, "")))
                }
              }
              resp.put("total_results", rows.size)
              resp.put("execution_time_ms", (System.nanoTime() - t0) / 1e6)
              respond(exchange, 200, resp.toString)
          }
        case _ => respond(exchange, 404, error("Not Found"))
      }
    } catch {
      case e: Exception => respond(exchange, 500, error(e.getMessage))
    }

  private def buildStore(rdf: Option[String], format: String): QuadStore = rdf match {
    case None => base.getOrElse(QuadStore.empty(spark))
    case Some(data) =>
      val triples = format match {
        case "ntriples" => RdfIO.parseNtDoc(data)
        case "turtle" | "n3" => RdfIO.parseTurtleDoc(data)
        case _ => RdfIO.parseRdfXmlDoc(data)
      }
      QuadStore.fromTriples(spark, triples)
  }

  private def runQueries(queries: Seq[String], rules: Seq[String],
      rdf: Option[String], format: String): ObjectNode = {
    val store = buildStore(rdf, format)
    if (rules.nonEmpty) {
      val parsed = rules.map(SparqlParser().parseRule)
      new Reasoner(spark).materialize(store, parsed)
    }
    val response = mapper.createObjectNode()
    val results = response.putArray("results")
    queries.zipWithIndex.foreach { case (q, idx) =>
      val t0 = System.nanoTime()
      val df = new Compiler(store).select(q)
      val cols = df.columns
      val rows = df.collect()
      val ms = (System.nanoTime() - t0) / 1e6
      val entry = results.addObject()
      entry.put("query_index", idx)
      entry.put("query", q)
      val data: ArrayNode = entry.putArray("data")
      rows.foreach { r =>
        val row = data.addArray()
        cols.zipWithIndex.foreach { case (c, i) =>
          val pair = row.addArray()
          pair.add(c)
          pair.add(if (r.isNullAt(i)) null else r.get(i).toString)
        }
      }
      entry.put("execution_time_ms", ms)
    }
    response
  }

  private def error(msg: String): String = {
    val n = mapper.createObjectNode()
    n.put("error", msg)
    n.toString
  }

  private def respond(exchange: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    val headers = exchange.getResponseHeaders
    headers.add("Content-Type", "application/json")
    headers.add("Access-Control-Allow-Origin", "*")
    headers.add("Access-Control-Allow-Methods", "GET, POST, OPTIONS")
    headers.add("Access-Control-Allow-Headers", "Content-Type")
    if (code == 204) exchange.sendResponseHeaders(code, -1)
    else {
      exchange.sendResponseHeaders(code, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    }
    exchange.close()
  }
}
