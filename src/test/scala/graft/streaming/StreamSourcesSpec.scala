package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** K1 Kafka framing, the S5 synthetic generator, the T3 watermarked
  * event-time aggregation, and the J2 stream-stream correlation. */
class StreamSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("toKafkaValue frames every column as JSON that decode() re-reads (K1)") {
    val df = Seq(("s1", 3L, 2500L)).toDF("stream_id", "chunk_index", "duration_ms")
    val framed = StreamSources.toKafkaValue(df)
    assert(framed.columns.toSeq === Seq("value"))
    val row = ChunkEvents.decode(StreamSources.frames(framed), liveDefaults = true).head
    assert(row.getAs[String]("stream_id") === "s1")
    assert(row.getAs[Long]("chunk_index") === 3L)
    assert(row.getAs[Long]("duration_ms") === 2500L)
  }

  test("syntheticLiveEvents: deterministic, round-robin streams, monotonic idx, decodable (S5)") {
    // pin the timestamp: without one the generator stamps evaluation time,
    // which differs between the two collects below
    val base = spark.range(0, 100).toDF("value")
      .withColumn("timestamp", to_timestamp(lit("2026-01-01 00:00:00")))
    val a = StreamSources.syntheticLiveEvents(base, nStreams = 2).collect().map(_.getString(0))
    val b = StreamSources.syntheticLiveEvents(base, nStreams = 2).collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq, "same base -> same events")

    val decoded = ChunkEvents.decode(
      StreamSources.syntheticLiveEvents(base, nStreams = 2), liveDefaults = true)
    assert(decoded.filter(col("corrupt")).count() === 0)
    val perStream = decoded.groupBy("stream_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStream === Map("live-0" -> 50L, "live-1" -> 50L))
    // chunk_index is 0..49 per stream; sequence gaps only ever jump forward
    val idx = decoded.filter($"stream_id" === "live-0")
      .orderBy($"chunk_index").select($"chunk_index", $"sequence_number").collect()
    assert(idx.map(_.getLong(0)).toSeq === (0L until 50L))
    assert(idx.forall(r => r.getLong(1) >= r.getLong(0)))
  }

  test("maxFilesPerTrigger admits exactly one file per micro-batch (W3/T8 stand-in)") {
    // The Kafka maxOffsetsPerTrigger options themselves are broker-blocked
    // in this sandbox; the file source's maxFilesPerTrigger plays the same
    // admission-control role and IS executable — one file admitted per
    // trigger, so a backlog drains over multiple bounded micro-batches
    // instead of one unbounded one.
    val dir = java.nio.file.Files.createTempDirectory("graft-mft").toString
    (0 until 3).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"f$i.txt"),
        s"""{"stream_id":"s$i","chunk_index":$i}""".getBytes)
    }
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = StreamSources.fileJsonLines(spark, dir, maxFilesPerTrigger = 1)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = batch.count()
        if (n > 0) batchSizes.add(n)
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mft-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    // 3 one-line files -> 3 micro-batches of exactly 1 row each
    assert(batchSizes.toArray(Array.empty[java.lang.Long]).toSeq === Seq(1L, 1L, 1L))
  }

  test("streaming exact dedup keeps first doc per content fingerprint (ingestion-time dedup)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val deduped = graft.operators.Dedup.exactStreaming(
      stream.toDS().toDF("event_ts", "doc_id", "text"), watermark = "1 minute")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val q = deduped.select($"doc_id").writeStream.format("memory")
      .queryName("sdedup_t").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      stream.addData(Seq(
        (ts("2026-01-01T00:00:00Z"), 1L, "The Quick Brown Fox!"),
        (ts("2026-01-01T00:00:10Z"), 2L, "the quick... brown fox"), // dup modulo noise
        (ts("2026-01-01T00:00:20Z"), 3L, "something else entirely")))
      q.processAllAvailable()
      stream.addData(Seq(
        (ts("2026-01-01T00:00:30Z"), 4L, "THE QUICK BROWN FOX"))) // dup across batches
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("sdedup_t").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L), s"kept $kept")
  }

  test("chunkRates: watermarked event-time windows aggregate chunk counts (T3/A7)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    def ev(sid: String, i: Long, ts: String) =
      s"""{"stream_id":"$sid","chunk_index":$i,"timestamp":"$ts","size_bytes":100}"""
    val rates = Pipelines.chunkRates(StreamSources.frames(stream.toDF()),
      windowLength = "1 minute", watermark = "30 seconds")
    val q = rates.writeStream.format("memory").queryName("rates_t")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    try {
      stream.addData(
        ev("s1", 0, "2026-01-01T00:00:05+00:00"),
        ev("s1", 1, "2026-01-01T00:00:25+00:00"),
        ev("s1", 2, "2026-01-01T00:01:10+00:00"),
        ev("s2", 0, "2026-01-01T00:00:59+00:00"))
      q.processAllAvailable()
      val rows = spark.table("rates_t").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant.toString,
          r.getAs[String]("stream_id")) -> r.getAs[Long]("chunks")).toMap
      assert(rows(("2026-01-01T00:00:00Z", "s1")) === 2L)
      assert(rows(("2026-01-01T00:01:00Z", "s1")) === 1L)
      assert(rows(("2026-01-01T00:00:00Z", "s2")) === 1L)
    } finally q.stop()
  }

  test("correlateWithControl: chunks join control events by key within skew (J2)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val chunks = MemoryStream[String]
    val control = MemoryStream[(String, java.sql.Timestamp, String)]
    def ev(sid: String, i: Long, ts: String) =
      s"""{"stream_id":"$sid","chunk_index":$i,"timestamp":"$ts"}"""
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

    val joined = Pipelines.correlateWithControl(
      StreamSources.frames(chunks.toDF()),
      control.toDS().toDF("stream_id", "control_ts", "action"),
      skew = "1 minute")
    val q = joined.writeStream.format("memory").queryName("corr_t")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.addData(
        ev("s1", 0, "2026-01-01T00:00:10+00:00"),
        ev("s1", 1, "2026-01-01T00:05:00+00:00"), // outside skew of the goal event
        ev("s2", 0, "2026-01-01T00:00:20+00:00")) // wrong key
      control.addData(("s1", ts("2026-01-01T00:00:30Z"), "goal"))
      q.processAllAvailable()
      // advance both watermarks far enough to emit
      chunks.addData(ev("s1", 9, "2026-01-01T01:00:00+00:00"))
      control.addData(("zz", ts("2026-01-01T01:00:00Z"), "noop"))
      q.processAllAvailable()
      val rows = spark.table("corr_t").collect()
        .map(r => (r.getAs[String]("stream_id"), r.getAs[Long]("chunk_index"),
          r.getAs[String]("action")))
      assert(rows.toSet === Set(("s1", 0L, "goal")))
    } finally q.stop()
  }
}
