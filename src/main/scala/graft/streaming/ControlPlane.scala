package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.Instant

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

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

  private def hmacHex(secret: String, payload: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(payload.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** What a presigned URL commits to: the object path and the absolute
    * expiry. Signing "GET\npath\nexpires" mirrors the information content of
    * the reference's SigV4 query-string auth (api/main.py:333-338) without
    * the AWS key machinery. */
  private def presignPayload(path: String, expiresEpoch: Long): String =
    s"GET\n$path\n$expiresEpoch"

  /** Validate a URL produced by [[Api]]'s presign: the signature must match
    * HMAC-SHA256(secret, "GET\npath\nexpires") and the expiry must be in the
    * future. Tampering with either the path or the expiry fails; comparison
    * is constant-time (MessageDigest.isEqual). */
  def validatePresigned(url: String, secret: String, now: Instant): Boolean = {
    val q = url.indexOf('?')
    if (q < 0) return false
    val prefix = "https://cdn.local/"
    if (!url.startsWith(prefix)) return false
    val path = url.substring(prefix.length, q)
    val params = url.substring(q + 1).split('&').flatMap { p =>
      val eq = p.indexOf('=')
      if (eq < 0) None else Some(p.substring(0, eq) -> p.substring(eq + 1))
    }.toMap
    (params.get("expires").flatMap(_.toLongOption), params.get("signature")) match {
      case (Some(exp), Some(sig)) =>
        exp > now.getEpochSecond && MessageDigest.isEqual(
          hmacHex(secret, presignPayload(path, exp)).getBytes(StandardCharsets.UTF_8),
          sig.getBytes(StandardCharsets.UTF_8))
      case _ => false
    }
  }

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
      vodTopic: String = "vod-chunks",
      presignSecret: String = "graft-dev-secret",
      presignTtlSeconds: Long = 3600L) {

    // api_latency.labels(endpoint=...).time() analogue
    // (api/main.py:221,317,373,428,472): wall-clock the whole call,
    // including failure paths, exactly like the reference's context manager.
    private def timed[A](endpoint: String)(body: => A): A = {
      val t0 = System.nanoTime()
      try body
      finally Metrics.observeApiDuration(endpoint, (System.nanoTime() - t0) / 1e9)
    }

    /** The per-chunk write sequence shared by upload and chunk-append: raw
      * placeholder put, status=uploaded metadata upsert, chunk event to the
      * VOD topic (api/main.py:236-291, parameterized by chunk index). */
    private def putVodChunk(streamId: String, chunkIndex: Long, title: String,
        durationSeconds: Double, fileSizeBytes: Long, resolution: String,
        audioId: String): Unit = {
      val checksum = md5hex(s"$streamId-$chunkIndex-$fileSizeBytes")
      val ts = now().toString
      val rawKey = s"$streamId/raw/$chunkIndex.ts"
      val durationMs = (durationSeconds * 1000).toLong

      objects.put("vod-raw", rawKey, Array.emptyByteArray, "video/mp2t", Map(
        "stream_id" -> streamId, "chunk_index" -> chunkIndex.toString,
        "title" -> title, "size_bytes" -> fileSizeBytes.toString))

      meta.upsert("vod_metadata", streamId, chunkIndex, Map(
        "stream_id" -> streamId,
        "chunk_index" -> chunkIndex.toString,
        "title" -> title,
        "timestamp" -> ts,
        "size_bytes" -> fileSizeBytes.toString,
        "stream_type" -> "vod",
        "status" -> "uploaded",
        "checksum" -> checksum,
        "duration_ms" -> durationMs.toString,
        "resolution" -> resolution,
        "keyframe_aligned" -> "true",
        "audio_track_id" -> audioId,
        "raw_path" -> s"vod-raw/$rawKey",
        "created_at" -> ts))

      // Field set and order per api/main.py:276-291.
      val event =
        s"""{"stream_id":${jsonStr(streamId)},"chunk_index":$chunkIndex,""" +
          s""""timestamp":${jsonStr(ts)},"size_bytes":$fileSizeBytes,""" +
          s""""stream_type":"vod","status":"uploaded","checksum":${jsonStr(checksum)},""" +
          s""""duration_ms":$durationMs,"resolution":${jsonStr(resolution)},""" +
          s""""keyframe_aligned":true,"audio_track_id":${jsonStr(audioId)},""" +
          s""""title":${jsonStr(title)},"raw_path":${jsonStr(s"vod-raw/$rawKey")}}"""
      publish(vodTopic, event)
      Metrics.inc(s"api_kafka_events_published_total{topic=$vodTopic}")
    }

    /** POST /vod/upload — returns the stream_id (api/main.py:205-307). */
    def uploadVod(req: VodUploadRequest): String = timed("/vod/upload") {
      val streamId = req.streamId.getOrElse(s"vod-${newId().take(12)}")
      putVodChunk(streamId, chunkIndex = 0L, title = req.title,
        durationSeconds = req.durationSeconds, fileSizeBytes = req.fileSizeBytes,
        resolution = req.resolution,
        audioId = req.audioTrackId.getOrElse(s"audio-$streamId"))
      Metrics.inc("api_requests_total{endpoint=/vod/upload,method=POST,status=200}")
      streamId
    }

    /** POST /vod/{id}/chunks — an EXTENSION beyond the reference (whose
      * upload is always a single chunk_index=0 event, api/main.py:226):
      * append the NEXT chunk to an existing VOD, so multi-chunk VODs — the
      * regime where [[Processors.VodProcessor]]'s manifest state cap spills
      * to the object store — can be driven end-to-end through the HTTP
      * layer. Chunk index is the stream's latest index + 1 (the API is the
      * single writer of vod_metadata chunk docs); title/resolution/audio
      * default from the latest chunk document. Returns the appended chunk
      * index, or None for an unknown stream. */
    def appendVodChunk(streamId: String, durationSeconds: Double,
        fileSizeBytes: Long): Option[Long] = timed("/vod/chunks") {
      meta.findLatest("vod_metadata", streamId, _ => true).map { latest =>
        val chunkIndex = latest.getOrElse("chunk_index", "-1").toLong + 1
        putVodChunk(streamId, chunkIndex,
          title = latest.getOrElse("title", ""),
          durationSeconds = durationSeconds, fileSizeBytes = fileSizeBytes,
          resolution = latest.getOrElse("resolution", "1920x1080"),
          audioId = latest.getOrElse("audio_track_id", s"audio-$streamId"))
        Metrics.inc("api_requests_total{endpoint=/vod/chunks,method=POST,status=200}")
        chunkIndex
      }
    }

    /** POST /streams/start (api/main.py:360-418). */
    def startStream(req: StreamStartRequest): String = timed("/streams/start") {
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
    def endStream(streamId: String): Boolean = timed("/streams/end") {
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
    }

    /** Presigned URL (api/main.py:333-338): HMAC-SHA256 over
      * "GET\npath\nexpires" with a 1 h TTL — a real signature (tampering
      * with path or expiry fails [[ControlPlane.validatePresigned]]),
      * standing in for boto3's SigV4 query-string auth. */
    private def presign(path: String): String = {
      val expires = now().getEpochSecond + presignTtlSeconds
      val sig = hmacHex(presignSecret, presignPayload(path, expires))
      s"https://cdn.local/$path?expires=$expires&signature=$sig"
    }

    /** GET /vod/{id}/manifest — W1: latest chunk having a manifest
      * (api/main.py:310-342, sort chunk_index desc + $exists filter). */
    def vodManifestUrl(streamId: String): Option[String] = timed("/vod/manifest") {
      meta.findLatest("vod_metadata", streamId, _.contains("manifest_path"))
        .map { d =>
          Metrics.inc("api_requests_total{endpoint=/vod/manifest,method=GET,status=200}")
          presign(d("manifest_path"))
        }
    }

    /** GET /streams/{id}/live (api/main.py:465-498). */
    def liveManifestUrl(streamId: String): Option[(String, String, Long)] = timed("/streams/live") {
      meta.find("live_metadata", streamId, StreamDocKey).flatMap { doc =>
        doc.get("manifest_path").map { p =>
          Metrics.inc("api_requests_total{endpoint=/streams/live,method=GET,status=200}")
          (presign(p), doc.getOrElse("status", ""),
            doc.getOrElse("dvr_window_start", "0").toLong)
        }
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
