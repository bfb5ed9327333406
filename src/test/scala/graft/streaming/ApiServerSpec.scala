package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ControlPlane.validatePresigned

/** Drives the reference's API surface over REAL HTTP (api/main.py routes,
  * endpoint-for-endpoint): the full VOD and live lifecycles, FastAPI-shaped
  * 404 envelopes, and the prometheus scrape — proving the process boundary,
  * not just the library semantics ControlPlaneSpec pins.
  *
  * Not a SparkSpec: pure JVM (JDK HttpServer + HttpClient), and the
  * process-wide metrics registry is reset here.
  */
class ApiServerSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def withServer(test: (String, mutable.Buffer[(String, String)],
      Sinks.InMemoryMetadataSink) => Unit): Unit = {
    Metrics.reset()
    val n = s"api-${System.nanoTime()}"
    val objects = new Sinks.InMemoryObjectStore(n)
    val meta = new Sinks.InMemoryMetadataSink(n)
    val published = mutable.Buffer[(String, String)]()
    val api = new ControlPlane.Api(objects, meta,
      publish = (t, v) => published += ((t, v)),
      now = () => Instant.parse("2026-03-01T10:00:00Z"),
      newId = () => "deadbeefcafe0123456789ab")
    val server = ApiServer.start(api, port = 0)
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", published, meta)
    finally { server.stop(0); Metrics.reset() }
  }

  private val client = HttpClient.newHttpClient()

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(url: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("health endpoint") {
    withServer { (base, _, _) =>
      val r = get(s"$base/health")
      assert(r.statusCode() === 200)
      assert(r.body() === """{"status":"ok","service":"pipeline-api"}""")
    }
  }

  test("VOD lifecycle over HTTP: upload -> metadata -> manifest (404 then 200)") {
    withServer { (base, published, meta) =>
      val up = post(s"$base/vod/upload",
        """{"title":"Grand Final","duration_seconds":4.5,"file_size_bytes":123456}""")
      assert(up.statusCode() === 200)
      val upJson = om.readTree(up.body())
      val id = upJson.get("stream_id").asText()
      assert(id === "vod-deadbeefcafe")
      assert(upJson.get("status").asText() === "uploaded")
      assert(upJson.get("kafka_topic").asText() === "vod-chunks")
      // the Kafka event went out exactly as the in-process path sends it
      assert(published.map(_._1) === Seq("vod-chunks"))

      val md = get(s"$base/vod/$id/metadata")
      assert(md.statusCode() === 200)
      assert(om.readTree(md.body()).get("status").asText() === "uploaded")
      assert(om.readTree(md.body()).get("title").asText() === "Grand Final")

      // manifest not yet produced by the pipeline -> FastAPI-shaped 404
      val miss = get(s"$base/vod/$id/manifest")
      assert(miss.statusCode() === 404)
      assert(om.readTree(miss.body()).get("detail").asText()
        .startsWith("Manifest not yet available"))

      // pipeline writes the manifest path -> 200 with a VALID presigned URL
      meta.upsert("vod_metadata", id, 0L,
        Map("manifest_path" -> s"manifests/$id/vod_manifest.m3u8"))
      val ok = get(s"$base/vod/$id/manifest")
      assert(ok.statusCode() === 200)
      val okJson = om.readTree(ok.body())
      assert(okJson.get("expires_in_seconds").asInt() === 3600)
      assert(validatePresigned(okJson.get("manifest_url").asText(),
        "graft-dev-secret", Instant.parse("2026-03-01T10:00:00Z")))

      // unknown stream
      assert(get(s"$base/vod/nope/metadata").statusCode() === 404)
    }
  }

  test("live lifecycle over HTTP: start -> live manifest -> end -> 404 on unknown") {
    withServer { (base, _, _) =>
      val start = post(s"$base/streams/start",
        """{"home_team":"Home","away_team":"Away","competition":"League","match_id":"match-42"}""")
      assert(start.statusCode() === 200)
      assert(om.readTree(start.body()).get("stream_id").asText() === "match-42")
      assert(om.readTree(start.body()).get("status").asText() === "live")

      val live = get(s"$base/streams/match-42/live")
      assert(live.statusCode() === 200)
      val liveJson = om.readTree(live.body())
      assert(liveJson.get("status").asText() === "live")
      assert(liveJson.get("dvr_window_start").asLong() === 0L)
      assert(liveJson.get("manifest_url").asText()
        .contains("manifests/match-42/live_manifest.m3u8"))

      val end = post(s"$base/streams/end", """{"stream_id":"match-42"}""")
      assert(end.statusCode() === 200)
      assert(om.readTree(end.body()).get("status").asText() === "vod")
      assert(om.readTree(end.body()).get("ended_at").asText() === "2026-03-01T10:00:00Z")

      assert(post(s"$base/streams/end", """{"stream_id":"ghost"}""").statusCode() === 404)
      assert(get(s"$base/streams/ghost/metadata").statusCode() === 404)
    }
  }

  test("caller-supplied ids with JSON metacharacters are escaped in responses") {
    withServer { (base, _, _) =>
      val tricky = """he said "hi" \ twice"""
      val start = post(s"$base/streams/start",
        om.writeValueAsString(om.createObjectNode()
          .put("home_team", "H").put("away_team", "A")
          .put("competition", "C").put("match_id", tricky)))
      assert(start.statusCode() === 200)
      // the body must PARSE, and round-trip the id exactly
      assert(om.readTree(start.body()).get("stream_id").asText() === tricky)
    }
  }

  test("chunk append: POST /vod/{id}/chunks increments the index, one event per chunk") {
    withServer { (base, published, _) =>
      val up = post(s"$base/vod/upload",
        """{"title":"Ep","duration_seconds":3.0,"file_size_bytes":100}""")
      assert(up.statusCode() === 200)
      val id = om.readTree(up.body()).get("stream_id").asText()

      val r1 = post(s"$base/vod/$id/chunks",
        """{"duration_seconds":3.0,"file_size_bytes":101}""")
      assert(r1.statusCode() === 200)
      assert(om.readTree(r1.body()).get("chunk_index").asLong() === 1L)
      assert(om.readTree(r1.body()).get("status").asText() === "uploaded")
      val r2 = post(s"$base/vod/$id/chunks",
        """{"duration_seconds":3.0,"file_size_bytes":102}""")
      assert(om.readTree(r2.body()).get("chunk_index").asLong() === 2L)

      // one VOD-topic event per chunk, indices 0..2, title inherited
      val events = published.filter(_._1 == "vod-chunks").map(_._2)
      assert(events.map(e => om.readTree(e).get("chunk_index").asLong()).toSeq
        === Seq(0L, 1L, 2L))
      assert(events.forall(e => om.readTree(e).get("title").asText() === "Ep"))

      // unknown stream -> FastAPI-shaped 404
      val missing = post(s"$base/vod/nope/chunks",
        """{"duration_seconds":1.0,"file_size_bytes":1}""")
      assert(missing.statusCode() === 404)
      assert(om.readTree(missing.body()).get("detail").asText() === "Stream not found")
    }
  }

  test("metrics scrape reflects HTTP-driven calls; malformed body is a 422") {
    withServer { (base, _, _) =>
      post(s"$base/vod/upload",
        """{"title":"T","duration_seconds":1.0,"file_size_bytes":1}""")
      val m = get(s"$base/metrics")
      assert(m.statusCode() === 200)
      assert(m.headers().firstValue("Content-Type").get ===
        "text/plain; version=0.0.4; charset=utf-8")
      assert(m.body().contains(
        """api_requests_total{endpoint="/vod/upload",method="POST",status="200"} 1"""))
      assert(m.body().contains(
        """api_request_duration_seconds_count{endpoint="/vod/upload"} 1"""))
      assert(m.body().contains(
        """api_kafka_events_published_total{topic="vod-chunks"} 1"""))

      val bad = post(s"$base/vod/upload", """{"title":"no size"}""")
      assert(bad.statusCode() === 422) // FastAPI's validation status
      assert(om.readTree(bad.body()).get("detail").asText()
        .contains("duration_seconds"))

      // UNPARSEABLE body is also a 422 (FastAPI's behavior), not a 500
      val unparseable = post(s"$base/vod/upload", """{"title": not json at all""")
      assert(unparseable.statusCode() === 422)
      assert(om.readTree(unparseable.body()).get("detail").asText()
        .contains("malformed JSON"))
    }
  }
}
