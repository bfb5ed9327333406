package graft.streaming

import java.time.Instant

import scala.collection.mutable

import graft.SparkSpec
import graft.streaming.ControlPlane.{StreamStartRequest, VodUploadRequest}

/** Control-plane semantics (api/main.py:205-307, 360-462, read paths) with
  * deterministic clock/ids, including the upload -> Kafka event -> Spark
  * decode round trip and the exactly-once ENDLIST append. */
class ControlPlaneSpec extends SparkSpec {

  private def fixture() = {
    val n = s"cp-${System.nanoTime()}"
    val objects = new Sinks.InMemoryObjectStore(n)
    val meta = new Sinks.InMemoryMetadataSink(n)
    val published = mutable.Buffer[(String, String)]()
    val api = new ControlPlane.Api(objects, meta,
      publish = (t, v) => published += ((t, v)),
      now = () => Instant.parse("2026-03-01T10:00:00Z"),
      newId = () => "deadbeefcafe0123456789ab")
    (objects, meta, published, api)
  }

  test("uploadVod: placeholder + uploaded doc + decodable Kafka event") {
    val (objects, meta, published, api) = fixture()
    Metrics.reset()
    val id = api.uploadVod(VodUploadRequest("Grand Final", durationSeconds = 4.5,
      fileSizeBytes = 123456))
    assert(id === "vod-deadbeefcafe")

    // the API's own metric surface (api/main.py:301,77-80), label-for-label
    assert(Metrics.counter(
      "api_requests_total{endpoint=/vod/upload,method=POST,status=200}") === 1L)
    assert(Metrics.counter(
      "api_kafka_events_published_total{topic=vod-chunks}") === 1L)
    assert(Metrics.apiExposition.contains(
      """api_requests_total{endpoint="/vod/upload",method="POST",status="200"} 1"""))

    // placeholder object (api/main.py:233-245)
    assert(objects.get("vod-raw", s"$id/raw/0.ts").get.isEmpty)

    // status=uploaded doc (api/main.py:252-273)
    val doc = meta.find("vod_metadata", id, 0L).get
    assert(doc("status") === "uploaded")
    assert(doc("duration_ms") === "4500")
    assert(doc("title") === "Grand Final")
    assert(doc("audio_track_id") === s"audio-$id")
    assert(doc("raw_path") === s"vod-raw/$id/raw/0.ts")

    // published event decodes through the SAME schema the pipeline uses
    assert(published.map(_._1) === Seq("vod-chunks"))
    import spark.implicits._
    val frames = Seq(published.head._2).toDF("value")
    val row = ChunkEvents.decode(frames, liveDefaults = false).head
    assert(!row.getAs[Boolean]("corrupt"))
    assert(row.getAs[String]("stream_id") === id)
    assert(row.getAs[Long]("duration_ms") === 4500L)
    assert(row.getAs[String]("title") === "Grand Final")
    assert(row.getAs[String]("status") === "uploaded")
    assert(row.getAs[java.sql.Timestamp]("event_ts").toInstant.toString
      === "2026-03-01T10:00:00Z")
  }

  test("startStream: pre-warm manifest golden string + live doc") {
    val (objects, meta, _, api) = fixture()
    val id = api.startStream(StreamStartRequest("Home", "Away", "League",
      matchId = Some("match-42")))
    assert(id === "match-42")
    assert(objects.getString("manifests", "match-42/live_manifest.m3u8").get
      === ControlPlane.EmptyLiveManifest)
    val doc = api.streamMetadata("match-42").get
    assert(doc("status") === "live")
    assert(doc("home_team") === "Home")
    assert(doc("chunk_count") === "0")
  }

  test("endStream appends ENDLIST exactly once and folds status to vod") {
    val (objects, meta, _, api) = fixture()
    val id = api.startStream(StreamStartRequest("H", "A", "C"))
    assert(api.endStream(id))
    assert(api.endStream(id)) // idempotent second call
    val manifest = objects.getString("manifests", s"$id/live_manifest.m3u8").get
    assert(manifest.sliding("#EXT-X-ENDLIST".length).count(_ == "#EXT-X-ENDLIST") === 1)
    val doc = api.streamMetadata(id).get
    assert(doc("status") === "vod")
    assert(doc("ended_at") === "2026-03-01T10:00:00Z")
    assert(!api.endStream("nonexistent"))
  }

  test("read path: vod manifest URL picks the LATEST chunk with a manifest (W1)") {
    val (_, meta, _, api) = fixture()
    meta.upsert("vod_metadata", "v1", 0L, Map("manifest_path" -> "manifests/v1/a.m3u8"))
    meta.upsert("vod_metadata", "v1", 2L, Map("manifest_path" -> "manifests/v1/c.m3u8"))
    meta.upsert("vod_metadata", "v1", 1L, Map("manifest_path" -> "manifests/v1/b.m3u8"))
    meta.upsert("vod_metadata", "v1", 3L, Map("status" -> "processing")) // no manifest yet
    val url = api.vodManifestUrl("v1").get
    assert(url.startsWith("https://cdn.local/manifests/v1/c.m3u8?expires="))
    assert(api.vodManifestUrl("missing").isEmpty)
  }

  test("presigned URLs: HMAC-signed, 1h TTL, tamper-evident") {
    val (_, meta, _, api) = fixture()
    meta.upsert("vod_metadata", "v1", 0L, Map("manifest_path" -> "manifests/v1/a.m3u8"))
    val url = api.vodManifestUrl("v1").get
    val now = Instant.parse("2026-03-01T10:00:00Z")

    // fixture clock 10:00:00Z + 3600s TTL
    assert(url.contains(s"expires=${now.getEpochSecond + 3600}"))
    assert(ControlPlane.validatePresigned(url, "graft-dev-secret", now))
    // still valid one second before expiry, not after
    assert(ControlPlane.validatePresigned(url, "graft-dev-secret",
      now.plusSeconds(3599)))
    assert(!ControlPlane.validatePresigned(url, "graft-dev-secret",
      now.plusSeconds(3600)))
    // tampered path
    assert(!ControlPlane.validatePresigned(
      url.replace("a.m3u8", "b.m3u8"), "graft-dev-secret", now))
    // tampered expiry (extend the TTL without re-signing)
    assert(!ControlPlane.validatePresigned(
      url.replace(s"expires=${now.getEpochSecond + 3600}",
        s"expires=${now.getEpochSecond + 7200}"), "graft-dev-secret", now))
    // wrong secret
    assert(!ControlPlane.validatePresigned(url, "other-secret", now))

    // per-endpoint duration histogram observed the calls (api/main.py:317)
    assert(Metrics.apiDurationHistogram("/vod/manifest").last._2 >= 1L)
  }

  test("presign property: round-trips for arbitrary paths/secrets, never cross-validates") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789/-_."
    for (_ <- 1 to 50) {
      val path = Seq.fill(1 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
        .replaceAll("^/+", "a") // keep a non-empty first segment
      val secret = s"secret-${rnd.nextLong()}"
      val t0 = Instant.ofEpochSecond(1000000000L + rnd.nextInt(Int.MaxValue))
      val n = s"pp-${rnd.nextLong()}"
      val api = new ControlPlane.Api(new Sinks.InMemoryObjectStore(n),
        new Sinks.InMemoryMetadataSink(n), publish = (_, _) => (),
        now = () => t0, presignSecret = secret)
      val meta2 = new Sinks.InMemoryMetadataSink(n)
      meta2.upsert("vod_metadata", "v", 0L, Map("manifest_path" -> path))
      val url = api.vodManifestUrl("v").get
      assert(ControlPlane.validatePresigned(url, secret, t0))
      assert(!ControlPlane.validatePresigned(url, secret + "x", t0))
      assert(!ControlPlane.validatePresigned(url, secret, t0.plusSeconds(3600)))
    }
  }

  test("full loop over HTTP: POST /vod/upload -> pipeline -> GET manifest is a valid signed URL") {
    val (objects, meta, published, api) = fixture()
    val server = ApiServer.start(api, port = 0)
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = java.net.http.HttpClient.newHttpClient()
      val up = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base/vod/upload"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"title":"Ep 1","duration_seconds":3.0,"file_size_bytes":999}"""))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(up.statusCode() === 200)
      val id = "vod-deadbeefcafe"
      assert(up.body().contains(s""""stream_id":"$id""""))

      // the HTTP-published Kafka event drives the SAME pipeline as in-process
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val ckpt = java.nio.file.Files.createTempDirectory("ckpt-cp-http").toString
      val q = Pipelines.startVod(StreamSources.frames(stream.toDF()), objects, meta, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0), queryName = "cp-http-vod")
      try {
        stream.addData(published.head._2)
        q.processAllAvailable()
      } finally q.stop()

      val mf = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base/vod/$id/manifest"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(mf.statusCode() === 200)
      val url = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(mf.body()).get("manifest_url").asText()
      assert(url.contains(s"manifests/$id/vod_manifest.m3u8"))
      assert(ControlPlane.validatePresigned(url, "graft-dev-secret",
        Instant.parse("2026-03-01T10:00:00Z")))
    } finally server.stop(0)
  }

  test("full loop: uploadVod event drives the VOD pipeline to status=ready") {
    val (objects, meta, published, api) = fixture()
    val id = api.uploadVod(VodUploadRequest("Ep 1", 3.0, 999))

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-cp").toString
    val q = Pipelines.startVod(StreamSources.frames(stream.toDF()), objects, meta, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0), queryName = "cp-vod")
    try {
      stream.addData(published.head._2)
      q.processAllAvailable()
    } finally q.stop()

    val doc = meta.find("vod_metadata", id, 0L).get
    assert(doc("status") === "ready") // uploaded -> ... -> ready (A8 fold)
    assert(doc("variant_paths").split(",").length === 4)
    assert(api.vodManifestUrl(id).get.contains(s"manifests/$id/vod_manifest.m3u8"))
  }
}
