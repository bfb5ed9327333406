package graft.streaming

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.streaming.ControlPlane.{StreamStartRequest, VodUploadRequest}

/** HTTP packaging of [[ControlPlane.Api]] — the process boundary the
  * reference exposes as FastAPI (api/main.py). Routes, request bodies,
  * response shapes, and error envelopes (`{"detail": ...}`, FastAPI's 404
  * format) are endpoint-for-endpoint:
  *
  *   GET  /health                      api/main.py:195-198
  *   POST /vod/upload                  :205-307
  *   GET  /vod/{id}/manifest           :310-343
  *   GET  /vod/{id}/metadata           :346-353
  *   POST /streams/start               :360-418
  *   POST /streams/end                 :421-462
  *   GET  /streams/{id}/live           :465-498
  *   GET  /streams/{id}/metadata       :501-509
  *   GET  /metrics                     (prometheus sub-app mount, :92-96)
  *
  * Built on the JDK's HttpServer (same zero-dependency choice as
  * Metrics.startHttpServer) over the in-process Api — the HTTP layer does
  * serialization and routing ONLY; every semantic lives in ControlPlane,
  * where the contract tests pin it. The api_requests_total /
  * api_request_duration_seconds metrics increment inside the Api calls,
  * so scrape output is identical whether the call arrived over HTTP or
  * in-process.
  */
object ApiServer {

  private val om = new ObjectMapper()

  private def respond(ex: HttpExchange, status: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def detail(ex: HttpExchange, status: Int, msg: String): Unit = {
    val node = om.createObjectNode()
    node.put("detail", msg)
    respond(ex, status, om.writeValueAsString(node))
  }

  private def docJson(doc: Map[String, String]): String = {
    val node = om.createObjectNode()
    doc.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    om.writeValueAsString(node)
  }

  private def opt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(!_.isNull).map(_.asText())

  private def required(n: JsonNode, field: String): String =
    opt(n, field).getOrElse(throw new IllegalArgumentException(s"missing field: $field"))

  // Response bodies go through jackson nodes, never string interpolation:
  // stream ids can be caller-supplied (upload stream_id, start match_id)
  // and must be escaped like FastAPI escapes them.
  private def obj(fields: (String, Any)*): String = {
    val node = om.createObjectNode()
    fields.foreach {
      case (k, v: String) => node.put(k, v)
      case (k, v: Long) => node.put(k, v)
      case (k, v: Int) => node.put(k, v)
      case (k, v) => node.put(k, String.valueOf(v))
    }
    om.writeValueAsString(node)
  }

  /** Start the API server; `vodTopic` echoes in the upload response like
    * the reference's VOD_TOPIC. Returns the server — `.stop(0)` shuts it
    * down. Port 0 binds an ephemeral port (tests). */
  def start(api: ControlPlane.Api, port: Int = 8000,
      vodTopic: String = "vod-chunks"): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    // without an executor the JDK server runs handlers on its dispatch
    // thread, serializing all requests; the reference API is concurrent
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      r => { val t = new Thread(r, "graft-api"); t.setDaemon(true); t }))

    server.createContext("/", (ex: HttpExchange) => {
      try route(api, vodTopic, ex)
      catch {
        // FastAPI returns 422 for unparseable bodies too (api/main.py's
        // pydantic validation), not just missing/invalid fields — jackson
        // parse failures must not surface as 500s
        case e: com.fasterxml.jackson.core.JsonProcessingException =>
          detail(ex, 422, s"malformed JSON body: ${e.getOriginalMessage}")
        case e: IllegalArgumentException => detail(ex, 422, e.getMessage)
        case e: Exception => detail(ex, 500, String.valueOf(e.getMessage))
      }
    })
    server.start()
    server
  }

  private def route(api: ControlPlane.Api, vodTopic: String, ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    def body: JsonNode = om.readTree(ex.getRequestBody.readAllBytes())

    (method, path.split("/").filter(_.nonEmpty).toList) match {
      case ("GET", List("health")) =>
        respond(ex, 200, """{"status":"ok","service":"pipeline-api"}""")

      case ("GET", List("metrics")) =>
        respond(ex, 200, Metrics.apiExposition,
          "text/plain; version=0.0.4; charset=utf-8")

      case ("POST", List("vod", "upload")) =>
        val b = body
        val id = api.uploadVod(VodUploadRequest(
          title = required(b, "title"),
          durationSeconds = required(b, "duration_seconds").toDouble,
          fileSizeBytes = required(b, "file_size_bytes").toLong,
          resolution = opt(b, "resolution").getOrElse("1920x1080"),
          streamId = opt(b, "stream_id"),
          audioTrackId = opt(b, "audio_track_id")))
        respond(ex, 200, obj(
          "stream_id" -> id,
          "status" -> "uploaded",
          "message" -> "VOD upload accepted; Spark will process asynchronously",
          "kafka_topic" -> vodTopic))

      case ("POST", List("vod", id, "chunks")) =>
        val b = body
        api.appendVodChunk(id,
          durationSeconds = required(b, "duration_seconds").toDouble,
          fileSizeBytes = required(b, "file_size_bytes").toLong) match {
          case Some(idx) => respond(ex, 200, obj(
            "stream_id" -> id, "chunk_index" -> idx, "status" -> "uploaded",
            "kafka_topic" -> vodTopic))
          case None => detail(ex, 404, "Stream not found")
        }

      case ("GET", List("vod", id, "manifest")) =>
        api.vodManifestUrl(id) match {
          case Some(url) => respond(ex, 200, obj(
            "stream_id" -> id, "manifest_url" -> url, "expires_in_seconds" -> 3600))
          case None => detail(ex, 404,
            "Manifest not yet available — processing may still be in progress")
        }

      case ("GET", List("vod", id, "metadata")) =>
        api.vodMetadata(id) match {
          case Some(doc) => respond(ex, 200, docJson(doc))
          case None => detail(ex, 404, "Stream not found")
        }

      case ("POST", List("streams", "start")) =>
        val b = body
        val id = api.startStream(StreamStartRequest(
          homeTeam = required(b, "home_team"),
          awayTeam = required(b, "away_team"),
          competition = required(b, "competition"),
          matchId = opt(b, "match_id")))
        respond(ex, 200, obj(
          "stream_id" -> id,
          "status" -> "live",
          "message" -> "Stream started. RTMP ingest server should now push chunks directly to Kafka."))

      case ("POST", List("streams", "end")) =>
        val id = required(body, "stream_id")
        if (!api.endStream(id)) detail(ex, 404, "Stream not found")
        else {
          val endedAt = api.streamMetadata(id).flatMap(_.get("ended_at")).getOrElse("")
          respond(ex, 200, obj(
            "stream_id" -> id, "status" -> "vod", "ended_at" -> endedAt))
        }

      case ("GET", List("streams", id, "live")) =>
        api.liveManifestUrl(id) match {
          case Some((url, status, dvrStart)) => respond(ex, 200, obj(
            "stream_id" -> id, "status" -> status, "manifest_url" -> url,
            "dvr_window_start" -> dvrStart))
          case None =>
            if (api.streamMetadata(id).isEmpty) detail(ex, 404, "Stream not found")
            else detail(ex, 404, "Manifest not yet available")
        }

      case ("GET", List("streams", id, "metadata")) =>
        api.streamMetadata(id) match {
          case Some(doc) => respond(ex, 200, docJson(doc))
          case None => detail(ex, 404, "Stream not found")
        }

      case _ => detail(ex, 404, "Not Found")
    }
  }
}
