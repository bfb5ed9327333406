package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the P2/P3/P6 decode-with-defaults semantics against the reference's
  * per-field fallbacks (spark_job/spark_streaming.py:364-372 live,
  * :209-216 VOD). */
class ChunkEventsSpec extends SparkSpec {

  private def decodeOne(json: String, live: Boolean) = {
    import spark.implicits._
    val frames = Seq(json).toDF("value")
      .withColumn("kafka_timestamp", to_timestamp(lit("2026-01-01 12:00:00")))
    ChunkEvents.decode(frames, liveDefaults = live).head
  }

  test("live defaults: every missing field gets the reference fallback") {
    val r = decodeOne("""{"stream_id":"s1"}""", live = true)
    assert(r.getAs[Long]("chunk_index") === 0L)
    assert(r.getAs[Long]("sequence_number") === 0L) // defaults to chunk_index
    assert(r.getAs[Long]("size_bytes") === 1000000L)
    assert(r.getAs[String]("stream_type") === "live")
    assert(r.getAs[String]("status") === "received")
    assert(r.getAs[String]("checksum") === "")
    assert(r.getAs[Long]("duration_ms") === 3000L)
    assert(r.getAs[Boolean]("keyframe_aligned") === true)
    assert(r.getAs[String]("audio_track_id") === "audio-s1")
    assert(r.getAs[String]("video_track_id") === "video-s1")
    assert(r.getAs[String]("resolution") === "1920x1080")
    // missing timestamp falls back to kafka_timestamp
    assert(r.getAs[java.sql.Timestamp]("event_ts").toString === "2026-01-01 12:00:00.0")
    assert(!r.getAs[Boolean]("corrupt"))
  }

  test("vod defaults differ where the reference differs") {
    val r = decodeOne("""{"stream_id":"v1"}""", live = false)
    assert(r.getAs[Long]("duration_ms") === 4000L)   // :209 vs :368
    assert(r.getAs[Long]("size_bytes") === 10000000L) // :211 vs :369
    assert(r.getAs[String]("stream_type") === "vod")
  }

  test("sequence_number defaults to chunk_index, not zero") {
    val r = decodeOne("""{"stream_id":"s1","chunk_index":7}""", live = true)
    assert(r.getAs[Long]("sequence_number") === 7L) // :365
  }

  test("explicit fields survive decode unchanged") {
    val r = decodeOne(
      """{"stream_id":"s1","chunk_index":3,"sequence_number":9,
        |"timestamp":"2026-02-03T04:05:06+00:00","size_bytes":42,
        |"duration_ms":2500,"checksum":"abc","audio_track_id":"A",
        |"video_track_id":"V","resolution":"640x360"}""".stripMargin.replace("\n", ""),
      live = true)
    assert(r.getAs[Long]("chunk_index") === 3L)
    assert(r.getAs[Long]("sequence_number") === 9L)
    assert(r.getAs[Long]("size_bytes") === 42L)
    assert(r.getAs[Long]("duration_ms") === 2500L)
    assert(r.getAs[String]("checksum") === "abc")
    assert(r.getAs[String]("audio_track_id") === "A")
    assert(r.getAs[String]("video_track_id") === "V")
    assert(r.getAs[String]("resolution") === "640x360")
    assert(r.getAs[java.sql.Timestamp]("event_ts").toInstant.toString === "2026-02-03T04:05:06Z")
  }

  test("corrupt isolation: bad JSON and missing stream_id are flagged, not fatal") {
    import spark.implicits._
    val frames = Seq(
      """{"stream_id":"ok","chunk_index":1}""",
      """not json at all}{""",
      """{"chunk_index":2}""").toDF("value")
      .withColumn("kafka_timestamp", to_timestamp(lit("2026-01-01 12:00:00")))
    val decoded = ChunkEvents.decode(frames, liveDefaults = true)
    assert(decoded.count() === 3)
    assert(decoded.filter(col("corrupt")).count() === 2)
    assert(ChunkEvents.valid(decoded).count() === 1)
  }

  test("unparseable timestamp falls back to kafka_timestamp (F4 null-safety)") {
    val r = decodeOne(
      """{"stream_id":"s1","timestamp":"not-a-timestamp"}""", live = true)
    assert(r.getAs[java.sql.Timestamp]("event_ts").toString === "2026-01-01 12:00:00.0")
  }
}
