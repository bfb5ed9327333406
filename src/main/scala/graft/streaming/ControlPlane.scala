package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.Instant

import graft.streaming.Sinks.{MetadataSink, ObjectStore}

/** The reference's FastAPI control plane as library functions — HTTP is
  * packaging, these are the semantics (SURVEY.md §7.2 step 6):
  *
  *  - VOD upload (api/main.py:205-307): id gen, raw placeholder put,
  *    status=uploaded metadata insert, chunk event published to the VOD
  *    topic (which is what triggers the Spark pipeline).
  *  - Stream start (api/main.py:360-418): empty pre-warm manifest + a
  *    stream-level document (status=live).
  *  - Stream end (api/main.py:421-462): append #EXT-X-ENDLIST exactly once,
  *    status -> vod.
  *  - Read path (api/main.py:310-353, 465-509): latest-chunk manifest
  *    lookup (W1), presigned-URL construction, metadata fetch.
  *
  * Injected `now`/`newId` keep tests deterministic; `publish` abstracts the
  * Kafka producer (K1) so tests capture events and production sends them.
  * Stream-level documents (no chunk dimension) use chunk key
  * [[ControlPlane.StreamDocKey]].
  *
  * Each successful call increments the reference API's own metric surface
  * (api_requests_total{endpoint,method,status}, api_kafka_events_published
  * _total{topic} — api/main.py:66-80, label-for-label, 200s only like the
  * reference), served by Metrics.apiExposition as its own scrape surface.
  */
object ControlPlane {

  val StreamDocKey: Long = -1L

  final case class VodUploadRequest(
      title: String,
      durationSeconds: Double,
      fileSizeBytes: Long,
      resolution: String = "1920x1080",
      streamId: Option[String] = None,
      audioTrackId: Option[String] = None)

  final case class StreamStartRequest(
      homeTeam: String,
      awayTeam: String,
      competition: String,
      matchId: Option[String] = None)

  /** Exact pre-chunk manifest the reference pre-warms CDNs with
    * (api/main.py:378-383). */
  val EmptyLiveManifest = "#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:4\n"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  final class Api(
      objects: ObjectStore,
      meta: MetadataSink,
      publish: (String, String) => Unit,
      now: () => Instant = () => Instant.now(),
      newId: () => String = () => java.util.UUID.randomUUID().toString.replace("-", ""),
      vodTopic: String = "vod-chunks") {

    /** POST /vod/upload — returns the stream_id (api/main.py:205-307). */
    def uploadVod(req: VodUploadRequest): String = {
      val streamId = req.streamId.getOrElse(s"vod-${newId().take(12)}")
      val chunkIndex = 0L
      val audioId = req.audioTrackId.getOrElse(s"audio-$streamId")
      val checksum = md5hex(s"$streamId-$chunkIndex-${req.fileSizeBytes}")
      val ts = now().toString
      val rawKey = s"$streamId/raw/$chunkIndex.ts"
      val durationMs = (req.durationSeconds * 1000).toLong

      objects.put("vod-raw", rawKey, Array.emptyByteArray, "video/mp2t", Map(
        "stream_id" -> streamId, "chunk_index" -> chunkIndex.toString,
        "title" -> req.title, "size_bytes" -> req.fileSizeBytes.toString))

      meta.upsert("vod_metadata", streamId, chunkIndex, Map(
        "stream_id" -> streamId,
        "chunk_index" -> chunkIndex.toString,
        "title" -> req.title,
        "timestamp" -> ts,
        "size_bytes" -> req.fileSizeBytes.toString,
        "stream_type" -> "vod",
        "status" -> "uploaded",
        "checksum" -> checksum,
        "duration_ms" -> durationMs.toString,
        "resolution" -> req.resolution,
        "keyframe_aligned" -> "true",
        "audio_track_id" -> audioId,
        "raw_path" -> s"vod-raw/$rawKey",
        "created_at" -> ts))

      // Field set and order per api/main.py:276-291.
      val event =
        s"""{"stream_id":${jsonStr(streamId)},"chunk_index":$chunkIndex,""" +
          s""""timestamp":${jsonStr(ts)},"size_bytes":${req.fileSizeBytes},""" +
          s""""stream_type":"vod","status":"uploaded","checksum":${jsonStr(checksum)},""" +
          s""""duration_ms":$durationMs,"resolution":${jsonStr(req.resolution)},""" +
          s""""keyframe_aligned":true,"audio_track_id":${jsonStr(audioId)},""" +
          s""""title":${jsonStr(req.title)},"raw_path":${jsonStr(s"vod-raw/$rawKey")}}"""
      publish(vodTopic, event)
      Metrics.inc(s"api_kafka_events_published_total{topic=$vodTopic}")
      Metrics.inc("api_requests_total{endpoint=/vod/upload,method=POST,status=200}")
      streamId
    }

    /** POST /streams/start (api/main.py:360-418). */
    def startStream(req: StreamStartRequest): String = {
      val streamId = req.matchId.getOrElse(s"live-${newId().take(12)}")
      val ts = now().toString
      objects.put("manifests", s"$streamId/live_manifest.m3u8",
        EmptyLiveManifest.getBytes(StandardCharsets.UTF_8),
        "application/vnd.apple.mpegurl", Map.empty)
      meta.upsert("live_metadata", streamId, StreamDocKey, Map(
        "stream_id" -> streamId,
        "match_id" -> req.matchId.getOrElse(""),
        "home_team" -> req.homeTeam,
        "away_team" -> req.awayTeam,
        "competition" -> req.competition,
        "stream_type" -> "live",
        "status" -> "live",
        "started_at" -> ts,
        "manifest_path" -> s"manifests/$streamId/live_manifest.m3u8",
        "chunk_count" -> "0",
        "dvr_window_start" -> "0"))
      Metrics.inc("api_requests_total{endpoint=/streams/start,method=POST,status=200}")
      streamId
    }

    /** POST /streams/end — ENDLIST appended exactly once; status -> vod
      * (api/main.py:421-462). Returns false if the stream is unknown. */
    def endStream(streamId: String): Boolean =
      meta.find("live_metadata", streamId, StreamDocKey) match {
        case None => false
        case Some(_) =>
          val key = s"$streamId/live_manifest.m3u8"
          objects.getString("manifests", key).foreach { current =>
            if (!current.contains("#EXT-X-ENDLIST")) {
              objects.put("manifests", key,
                (current + "\n#EXT-X-ENDLIST\n").getBytes(StandardCharsets.UTF_8),
                "application/vnd.apple.mpegurl", Map.empty)
            }
          }
          meta.upsert("live_metadata", streamId, StreamDocKey,
            Map("status" -> "vod", "ended_at" -> now().toString))
          Metrics.inc("api_requests_total{endpoint=/streams/end,method=POST,status=200}")
          true
      }

    /** Deterministic stand-in for the presigned URL (api/main.py:333-338):
      * same information content, no crypto. */
    private def presign(path: String): String =
      s"https://cdn.local/$path?expires=3600"

    /** GET /vod/{id}/manifest — W1: latest chunk having a manifest
      * (api/main.py:310-342, sort chunk_index desc + $exists filter). */
    def vodManifestUrl(streamId: String): Option[String] =
      meta.findLatest("vod_metadata", streamId, _.contains("manifest_path"))
        .map { d =>
          Metrics.inc("api_requests_total{endpoint=/vod/manifest,method=GET,status=200}")
          presign(d("manifest_path"))
        }

    /** GET /streams/{id}/live (api/main.py:465-498). */
    def liveManifestUrl(streamId: String): Option[(String, String, Long)] =
      meta.find("live_metadata", streamId, StreamDocKey).flatMap { doc =>
        doc.get("manifest_path").map { p =>
          Metrics.inc("api_requests_total{endpoint=/streams/live,method=GET,status=200}")
          (presign(p), doc.getOrElse("status", ""),
            doc.getOrElse("dvr_window_start", "0").toLong)
        }
      }

    /** GET /vod/{id}/metadata / /streams/{id}/metadata (api/main.py:345,501). */
    def vodMetadata(streamId: String, chunkIndex: Long = 0L): Option[Map[String, String]] = {
      val r = meta.find("vod_metadata", streamId, chunkIndex)
      if (r.isDefined)
        Metrics.inc("api_requests_total{endpoint=/vod/metadata,method=GET,status=200}")
      r
    }
    def streamMetadata(streamId: String): Option[Map[String, String]] = {
      val r = meta.find("live_metadata", streamId, StreamDocKey)
      if (r.isDefined)
        Metrics.inc("api_requests_total{endpoint=/streams/metadata,method=GET,status=200}")
      r
    }
  }
}
