package graft.registry

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** C5: the REST operation layer — the reference's remote management
  * surface (/root/reference hbase-indexer-server
  * .../rest/IndexerResource.java:60-196):
  *
  *   GET  /indexer                          → list definitions
  *   GET  /indexer/{name}                   → one definition
  *   GET  /indexer/{name}/config            → the mapping config XML
  *   PUT  /indexer/{name}                   → update with OCC (409 on a
  *                                            stale occVersion)
  *   POST /indexer/{name}?action=index&id=… → one-row reindex (S5)
  *   POST /indexer?action=index&indexes=a,b → batch rebuild of the named
  *                                            indexers
  *
  * The operation set is the parity target; dispatch is transport-
  * independent ([[IndexerResource.handle]]) so it is testable in-process,
  * with a thin JDK HttpServer binding ([[RestServer]]) for actual remote
  * management — no extra dependencies. */
case class ApiResponse(status: Int, body: String, contentType: String = "application/json")

class IndexerResource(registry: IndexerRegistry, supervisor: IndexerSupervisor) {

  private def ok(body: String) = ApiResponse(200, body)

  /** JSON string literal for a DYNAMIC value (class label, source path,
    * indexer name): quotes, backslashes, and control characters escape
    * instead of producing invalid JSON. */
  private def jstr(v: String): String =
    v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }.mkString("\"", "", "\"")
  private def err(status: Int, msg: String) =
    ApiResponse(status, s"""{"error": "${msg.replaceAll("[\"\\\\\n\r\t]", " ")}"}""")
  private def notFound(name: String) = err(404, s"no such indexer: $name")

  def handle(method: String, path: String, params: Map[String, String],
             body: String): ApiResponse = {
    val segs = path.split("/").toList.filter(_.nonEmpty)
    (method.toUpperCase, segs) match {
      case ("GET", List("indexer")) =>
        ok(registry.list().map(registry.toJson).mkString("[", ",\n", "]"))

      case ("GET", List("indexer", name)) =>
        registry.get(name).map(d => ok(registry.toJson(d))).getOrElse(notFound(name))

      case ("GET", List("indexer", name, "config")) =>
        registry.get(name).map(d => ApiResponse(200, d.configXml, "text/xml"))
          .getOrElse(notFound(name))

      // live per-source consumed/pending census — unlike /progress (a
      // snapshot from the last drain) this reads the log and checkpoint
      // NOW, so a growing backlog is visible between drains
      case ("GET", List("indexer", name, "lag")) =>
        if (registry.get(name).isEmpty) notFound(name)
        else {
          val lag = supervisor.sourceLag(name).toSeq.sortBy(_._1).map { case (s, l) =>
            s"""${jstr(s)}: {"processed": ${l.processed}, "backlog": ${l.backlog}}"""
          }.mkString("{", ", ", "}")
          ok(lag)
        }

      // T6 over the wire: the reference's replication-status surface is a
      // separate JMX/CLI tool; here the drain report is one GET away
      case ("GET", List("indexer", name, "progress")) =>
        if (registry.get(name).isEmpty) notFound(name)
        else supervisor.progressReport(name) match {
          case None => err(404, s"indexer $name has not consumed yet")
          case Some(p) =>
            val bySource = p.bySource.toSeq.sortBy(_._1).map { case (s, l) =>
              s"""${jstr(s)}: {"processed": ${l.processed}, "backlog": ${l.backlog}}"""
            }.mkString("{", ", ", "}")
            ok(
            s"""{"batches": ${p.batches}, "inputRows": ${p.inputRows},
               | "events": ${p.events}, "applicable": ${p.applicable},
               | "avgEventsPerSec": ${p.avgEventsPerSec},
               | "lastBatchDurationMs": ${p.lastBatchDurationMs},
               | "processedFiles": ${p.processedFiles}, "backlogFiles": ${p.backlogFiles},
               | "bySource": $bySource,
               | "lastCommittedVersion": ${p.lastCommittedVersion.map(jstr).getOrElse("null")}}""".stripMargin)
        }

      case ("PUT", List("indexer", name)) =>
        try {
          val d = registry.fromJson(body)
          if (d.name != name) err(400, s"definition name '${d.name}' does not match path '$name'")
          else {
            val updated = registry.update(d)
            // the reference's DELETE verb: a PUT flipping lifecycleState
            // to DELETE_REQUESTED (IndexerResource.java:116-130); the
            // master watches the model and executes — here the
            // supervisor reacts before the response returns, so the
            // delete is fully reachable over REST alone
            if (updated.lifecycleState == LifecycleState.DeleteRequested)
              supervisor.sync()
            ok(registry.toJson(updated))
          }
        } catch {
          case e: ConcurrentModificationError => err(409, e.getMessage)
          case e: IllegalStateException => err(404, e.getMessage)
          case e: Exception => err(400, s"bad definition: ${e.getMessage}")
        }

      // the re-crawl arm's triage, summarized (counts by status) — the
      // full diff is corpus-sized and belongs in a dataset, not a GET
      case ("GET", List("indexer", name, "recrawl")) =>
        if (registry.get(name).isEmpty) notFound(name)
        else try {
          val counts = supervisor.recrawlDiff(name)
            .groupBy(org.apache.spark.sql.functions.col("status")).count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
          ok(counts.map { case (s, n) => s"${jstr(s)}: $n" }.mkString("{", ", ", "}"))
        } catch {
          case e: IllegalStateException => err(404, e.getMessage)
        }

      // the contamination-audit arm's dashboard: probe counts by class —
      // the per-probe frame is benchmark-sized and belongs in a dataset,
      // the GET returns the numbers a release policy thresholds on
      case ("GET", List("indexer", name, "coverage")) =>
        if (registry.get(name).isEmpty) notFound(name)
        else try {
          val rows = supervisor.coverageReport(name)
            .select(org.apache.spark.sql.functions.col("cov_q")).collect()
          val covs = rows.map(_.getLong(0))
          val contaminated = covs.count(_ >= 500000L)
          val maxCov = if (covs.isEmpty) 0L else covs.max
          ok(s"""{"probes": ${covs.length}, "contaminated": $contaminated, "max_cov_q": $maxCov}""")
        } catch {
          case e: IllegalStateException => err(404, e.getMessage)
        }

      // the vector arm's rebalance dashboard: per-cell counts + hot
      // flags (above ⌈total/cells⌉) — the number an operator reads
      // before a split/rebuild; probe latency tracks the hottest cell
      case ("GET", List("indexer", name, "cells")) =>
        if (registry.get(name).isEmpty) notFound(name)
        else try {
          val cells = supervisor.vectorCellCensus(name)
          val rows = cells.map { case (c, n, hot) =>
            s"""{"c_id": $c, "n": $n, "hot": $hot}""" }
          ok(s"""{"cells": ${rows.mkString("[", ", ", "]")}, """ +
            s""""n_hot": ${cells.count(_._3)}}""")
        } catch {
          case e: IllegalStateException => err(404, e.getMessage)
          case e: IllegalArgumentException => err(404, e.getMessage)
        }

      // the quota arm's budget dashboard: per-class admitted counters
      case ("GET", List("indexer", name, "quota")) =>
        if (registry.get(name).isEmpty) notFound(name)
        else {
          val counts = supervisor.quotaStatus(name).toSeq.sortBy(_._1)
          ok(counts.map { case (c, n) => s"${jstr(c)}: $n" }.mkString("{", ", ", "}"))
        }

      // vector-arm maintenance: apply tombstones physically, flip the
      // manifest — the GoLive-shaped compaction verb
      case ("POST", List("indexer", name))
          if params.get("action").contains("compact-vectors") =>
        if (registry.get(name).isEmpty) notFound(name)
        else try ok(s"""{"indexer": "$name", "generation": "${supervisor.compactVectorIndex(name)}"}""")
        catch { case e: IllegalArgumentException => err(404, e.getMessage) }

      case ("POST", List("indexer", name)) if params.get("action").contains("index") =>
        params.get("id") match {
          case None => err(400, "missing id parameter")
          case Some(id) =>
            if (registry.get(name).isEmpty) notFound(name)
            else ok(s"""{"indexer": "$name", "id": "$id", "ops": ${supervisor.reindexRow(name, id)}}""")
        }

      case ("POST", List("indexer")) if params.get("action").contains("index") =>
        val names = params.getOrElse("indexes", "").split(",").map(_.trim).filter(_.nonEmpty)
        val missing = names.filterNot(n => registry.get(n).isDefined)
        if (names.isEmpty) err(400, "missing indexes parameter")
        else if (missing.nonEmpty) notFound(missing.mkString(","))
        else {
          names.foreach(supervisor.requestBatchBuild)
          supervisor.sync()
          ok(names.map(jstr).mkString("{\"rebuilt\": [", ",", "]}"))
        }

      case _ => err(404, s"no such operation: $method $path")
    }
  }
}

/** Minimal HTTP binding over the JDK's built-in server. Bind with port=0
  * for an ephemeral port (see [[boundPort]]). */
class RestServer(resource: IndexerResource, port: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    val resp =
      try {
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split("&").toSeq.filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        resource.handle(ex.getRequestMethod, ex.getRequestURI.getPath, params, body)
      } catch {
        case e: Exception => ApiResponse(500, s"""{"error": "internal: ${e.getClass.getSimpleName}"}""")
      }
    val bytes = resp.body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", resp.contentType)
    ex.sendResponseHeaders(resp.status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
