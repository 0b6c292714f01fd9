package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Minimal HTTP adapter over [[PipelineApi]] — the reference's Flask
  * service surface (`/root/reference/core/endpoints.py:11-87`), servable
  * with zero new dependencies (JDK `com.sun.net.httpserver`; Jackson is
  * already on Spark's classpath).
  *
  * Routes and shapes mirror the reference exactly:
  *  - `GET /heartbeat` → 200 `{"status":"healthy","timestamp":...,
  *    "service":<name>}`
  *  - `POST /clean_columns | /clean_rows | /create_sensitive_tier` with
  *    `{"source": path, "destination": path}`;
  *    `POST /merge_table_versions` with `"source"` as a LIST of paths —
  *    each → 200 `{"status": <transform status>, "timestamp", "service"}`
  *  - missing/empty source or destination → 400 with the reference's
  *    description text (`core/request_helpers.py:11`)
  *  - any transform failure → 500 `{"error":"Internal Server Error",
  *    "message": <exception>}` (`endpoints.py:35`)
  *
  * Scale note: this is a CONTROL-plane adapter — each request triggers a
  * distributed Spark job and returns when the write lands, exactly like
  * the reference's BigQuery CTAS calls; no data flows through the HTTP
  * process. Port 0 binds an ephemeral port (returned by [[start]]).
  *
  * The host should build `spark` through [[graft.GraftSession.configure]]
  * so the engine-level settings (output-committer v2, wide-schema codegen
  * width, checkpoint hygiene) apply to API-triggered jobs too — they are
  * engine configs, not bench-harness ones (the test host does exactly
  * this via SparkSpec). */
final class PipelineServer(spark: SparkSession, port: Int = 0,
    serviceName: String = "graft", auditDir: String = "/tmp/graft-audit") {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))

  private def json(fields: (String, String)*): String = {
    val node = mapper.createObjectNode()
    fields.foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def ok(ex: HttpExchange, status: String): Unit =
    respond(ex, 200, json(
      "status" -> status,
      "timestamp" -> java.time.Instant.now().toString,
      "service" -> serviceName))

  /** The reference's request_helpers.extract_source_and_destination 400. */
  private val MissingParams =
    "Missing required parameter(s): 'source' and/or 'destination'."

  private def handlePost(ex: HttpExchange)(run: java.util.Map[String, Object] => String): Unit = {
    if (ex.getRequestMethod != "POST") { respond(ex, 405, json("error" -> "Method Not Allowed")) }
    else {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val mapping: java.util.Map[String, Object] =
        if (body.isEmpty) new java.util.HashMap()
        else mapper.readValue(body, classOf[java.util.Map[String, Object]])
      val src = mapping.get("source")
      val dst = mapping.get("destination")
      val missing = src == null || dst == null ||
        (src.isInstanceOf[String] && src.asInstanceOf[String].isEmpty) ||
        (src.isInstanceOf[java.util.List[_]] && src.asInstanceOf[java.util.List[_]].isEmpty) ||
        (dst.isInstanceOf[String] && dst.asInstanceOf[String].isEmpty)
      if (missing) respond(ex, 400, json("error" -> "Bad Request", "message" -> MissingParams))
      else try ok(ex, run(mapping))
      catch {
        case NonFatal(e) =>
          respond(ex, 500, json("error" -> "Internal Server Error",
            "message" -> String.valueOf(e.getMessage)))
      }
    }
  }

  server.createContext("/heartbeat", (ex: HttpExchange) =>
    if (ex.getRequestMethod == "GET") ok(ex, "healthy")
    else respond(ex, 405, json("error" -> "Method Not Allowed")))

  server.createContext("/clean_columns", (ex: HttpExchange) => handlePost(ex) { m =>
    PipelineApi.cleanColumns(spark, m.get("source").toString,
      m.get("destination").toString,
      tableId = Option(m.get("table_id")).map(_.toString).getOrElse(""),
      auditDir = auditDir).status
  })

  server.createContext("/clean_rows", (ex: HttpExchange) => handlePost(ex) { m =>
    PipelineApi.cleanRows(spark, m.get("source").toString,
      m.get("destination").toString,
      useReference = Option(m.get("use_reference"))
        .forall(_.toString.toBoolean),
      auditDir = auditDir).status
  })

  server.createContext("/merge_table_versions", (ex: HttpExchange) => handlePost(ex) { m =>
    val sources = m.get("source") match {
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case s => Seq(s.toString)
    }
    PipelineApi.mergeTableVersions(spark, sources,
      m.get("destination").toString, auditDir = auditDir).status
  })

  server.createContext("/create_sensitive_tier", (ex: HttpExchange) => handlePost(ex) { m =>
    PipelineApi.createSensitiveTier(spark, m.get("source").toString,
      m.get("destination").toString, auditDir = auditDir).status
  })

  /** Binds and serves; returns the bound port (useful with port 0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)
}
