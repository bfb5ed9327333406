package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source abstraction producing "Kafka-shaped frames": a streaming DataFrame
  * with `value: string` (the JSON event) and `kafka_timestamp: timestamp`
  * (broker receive time). Everything downstream — decode, keyed state,
  * sinks — is source-agnostic, so tests drive the identical pipeline from a
  * MemoryStream or a file directory while production subscribes to Kafka.
  *
  * The Kafka options mirror the reference exactly
  * (spark_job/spark_streaming.py:572-583 VOD, :589-599 live):
  * startingOffsets=latest, failOnDataLoss=false, per-topic
  * maxOffsetsPerTrigger (10 VOD / 100 live) as the admission-control /
  * backpressure knob (T8/T9/W3).
  */
object StreamSources {

  /** Kafka subscription settings for one topic. */
  final case class KafkaShape(
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long,
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = false)

  val VodShape: String => KafkaShape =
    KafkaShape(_, "vod-chunks", maxOffsetsPerTrigger = 10L)
  val LiveShape: String => KafkaShape =
    KafkaShape(_, "live-chunks", maxOffsetsPerTrigger = 100L)

  /** Kafka source scan (S1/S2). Compiles against the built-in `kafka`
    * format; requires spark-sql-kafka on the classpath at runtime. */
  def kafka(spark: SparkSession, shape: KafkaShape): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", shape.bootstrapServers)
      .option("subscribe", shape.topic)
      .option("startingOffsets", shape.startingOffsets)
      .option("maxOffsetsPerTrigger", shape.maxOffsetsPerTrigger.toString)
      .option("failOnDataLoss", shape.failOnDataLoss.toString)
      .load()
      .selectExpr("CAST(value AS STRING) AS value", "timestamp AS kafka_timestamp")

  /** File-based stand-in: each text line in `dir` is one JSON event.
    * `maxFilesPerTrigger` plays the maxOffsetsPerTrigger role. */
  def fileJsonLines(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(dir)
      .select(col("value"), current_timestamp().as("kafka_timestamp"))

  /** Adapt any `value: string` streaming DataFrame (e.g. a MemoryStream in
    * tests) to the frame shape. */
  def frames(values: DataFrame): DataFrame =
    if (values.columns.contains("kafka_timestamp")) values
    else values.select(col("value"), current_timestamp().as("kafka_timestamp"))

  // ------------------------------------------------------------------ K1
  /** Kafka producer framing: every column JSON-serialized into `value`
    * (reference api/main.py:112-118 / producer.py:108-116 do
    * json.dumps(dict); here it's codegen'd to_json(struct(*))). */
  def toKafkaValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Kafka producer sink (K1): acks=all like the reference producers. */
  def writeKafka(df: DataFrame, bootstrapServers: String, topic: String,
      checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    toKafkaValue(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("kafka.acks", "all")
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  // ------------------------------------------------------------------ S5
  /** Deterministic synthetic live-chunk generator over any (value: long)
    * base — `spark.readStream.format("rate")` in production, a batch
    * `spark.range` in tests. Mirrors the reference producer's shape
    * (producer/producer.py:283-307): round-robin streams, monotonic chunk
    * index per stream, sizes 500KB-2MB, durations 2-4s, and one injected
    * sequence gap per 200 chunks (producer.py:269,276-281) — but keyed on
    * a stable formula instead of RNG so every run generates the same stream.
    *
    * Gap injection is CUMULATIVE like the reference's
    * `sequence_number += skipped` (producer.py:280): the m-th gap point of a
    * stream (chunk index ≡ 199 mod 200) skips `1 + m%3` sequence slots and
    * every later chunk keeps the offset, so seq is monotone non-decreasing
    * and a gap never triggers the T4 late-seq reset on the following chunk.
    * The prefix sum of skip sizes has the closed form
    * `m + 3*floor(m/3) + (m%3==2 ? 1 : 0)` (full 1+2+3 cycles plus the
    * started cycle), so the generator stays a pure column expression. */
  def syntheticLiveEvents(base: DataFrame, nStreams: Int = 2, gapEvery: Int = 200): DataFrame = {
    val withTs =
      if (base.columns.contains("timestamp")) base
      else base.withColumn("timestamp", current_timestamp())
    val v = col("value")
    val sid = concat(lit("live-"), pmod(v, lit(nStreams)).cast("string"))
    val idx = (v / nStreams).cast("long")
    val h = abs(xxhash64(sid, idx))
    // m = number of gap points at chunk indices <= idx; cumGap = sum of the
    // cycling skip sizes (1,2,3,1,2,...) over those m points.
    val m = floor((idx + 1L) / gapEvery.toLong).cast("long")
    val cumGap = m + lit(3L) * floor(m / 3L).cast("long") +
      when(pmod(m, lit(3L)) === 2L, 1L).otherwise(0L)
    withTs.select(
      to_json(struct(
        sid.as("stream_id"),
        idx.as("chunk_index"),
        (idx + cumGap).as("sequence_number"),
        // millisecond precision, like the reference producer's
        // datetime.isoformat() (producer.py:289): truncating to whole
        // seconds inflated every measured per-chunk latency by U(0,1) s
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("timestamp"),
        (lit(500000L) + pmod(h, lit(1500000L))).as("size_bytes"),
        lit("live").as("stream_type"),
        lit("received").as("status"),
        md5(concat_ws(":", sid, idx.cast("string"))).as("checksum"),
        (lit(2000L) + pmod(h, lit(2000L))).as("duration_ms"),
        lit(true).as("keyframe_aligned"),
        concat(lit("audio-"), sid).as("audio_track_id"),
        concat(lit("video-"), sid).as("video_track_id"))).as("value"),
      col("timestamp").as("kafka_timestamp"))
  }

  /** Rate-source wiring for [[syntheticLiveEvents]]. */
  def syntheticLiveSource(spark: SparkSession, rowsPerSecond: Int, nStreams: Int = 2,
      gapEvery: Int = 200): DataFrame =
    syntheticLiveEvents(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load(),
      nStreams, gapEvery)

  /** Deterministic synthetic VOD-upload generator: the Kafka event the
    * reference API publishes per uploaded chunk (api/main.py:275-291 —
    * stream_id, chunk_index, timestamp, size_bytes, stream_type=vod,
    * status=uploaded, checksum, duration_ms, resolution, title,
    * keyframe_aligned, audio_track_id, raw_path), keyed on a stable hash
    * like [[syntheticLiveEvents]] so every run generates the same stream.
    * No sequence gaps: VOD uploads are client-acknowledged, the gap quirk
    * is live-only (producer.py:269-281). */
  def syntheticVodEvents(base: DataFrame, nStreams: Int = 2): DataFrame = {
    val withTs =
      if (base.columns.contains("timestamp")) base
      else base.withColumn("timestamp", current_timestamp())
    val v = col("value")
    val sid = concat(lit("vod-"), pmod(v, lit(nStreams)).cast("string"))
    val idx = (v / nStreams).cast("long")
    val h = abs(xxhash64(sid, idx))
    withTs.select(
      to_json(struct(
        sid.as("stream_id"),
        idx.as("chunk_index"),
        // millisecond precision, like the reference producer's
        // datetime.isoformat() (producer.py:289): truncating to whole
        // seconds inflated every measured per-chunk latency by U(0,1) s
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("timestamp"),
        (lit(8000000L) + pmod(h, lit(42000000L))).as("size_bytes"),
        lit("vod").as("stream_type"),
        lit("uploaded").as("status"),
        md5(concat_ws(":", sid, idx.cast("string"))).as("checksum"),
        (lit(4000L) + pmod(h, lit(4000L))).as("duration_ms"),
        lit("1920x1080").as("resolution"),
        lit(true).as("keyframe_aligned"),
        concat(lit("audio-"), sid).as("audio_track_id"),
        concat(lit("Match "), sid).as("title"),
        concat(lit("vod-raw/"), sid, lit("/raw/"), idx.cast("string"), lit(".ts"))
          .as("raw_path"))).as("value"),
      col("timestamp").as("kafka_timestamp"))
  }

  /** Rate-source wiring for [[syntheticVodEvents]]. */
  def syntheticVodSource(spark: SparkSession, rowsPerSecond: Int,
      nStreams: Int = 2): DataFrame =
    syntheticVodEvents(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load(),
      nStreams)
}
