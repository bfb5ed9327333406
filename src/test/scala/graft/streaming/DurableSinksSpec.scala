package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.ManifestFunctions
import graft.functions.ManifestFunctions.Segment
import graft.streaming.Processors.LiveResult

/** The durable (filesystem) ObjectStore/MetadataSink implementations run
  * through the SAME contracts the in-memory stores are pinned by: replay
  * idempotency and checkpoint-restart with no duplicate delivery — proving
  * the Sinks trait seam holds for a store that outlives the JVM
  * (DEVIATIONS #8's promise). Plus durability itself: a second store
  * instance over the same root sees the first instance's writes. */
/** ObjectStore wrapper that injects ONE mid-partition task failure: the
  * N-th put() on a task's first attempt throws AFTER earlier puts landed,
  * leaving genuinely partial sink state for the retry to reconcile. Local
  * mode runs executors in this JVM, so the companion's statics observe both
  * attempts. */
final class ChaosObjectStore(inner: Sinks.ObjectStore)
    extends Sinks.ObjectStore with Serializable {
  override def put(bucket: String, key: String, body: Array[Byte],
      contentType: String, meta: Map[String, String]): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) ChaosObjectStore.maxAttemptSeen.accumulateAndGet(
      tc.attemptNumber(), math.max)
    if (tc != null && tc.attemptNumber() == 0 &&
        ChaosObjectStore.puts.incrementAndGet() == ChaosObjectStore.failOnPut &&
        ChaosObjectStore.fired.compareAndSet(false, true))
      throw new RuntimeException("chaos: injected task failure mid-delivery")
    inner.put(bucket, key, body, contentType, meta)
  }
  override def get(bucket: String, key: String): Option[Array[Byte]] =
    inner.get(bucket, key)
  override def keys(bucket: String): Seq[String] = inner.keys(bucket)
}

object ChaosObjectStore {
  val puts = new java.util.concurrent.atomic.AtomicInteger(0)
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
  val maxAttemptSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failOnPut: Int = Int.MaxValue
  def reset(failOnPut: Int): Unit = {
    puts.set(0); fired.set(false); maxAttemptSeen.set(0); this.failOnPut = failOnPut
  }
}

class DurableSinksSpec extends SparkSpec {

  private def eventJson(streamId: String, idx: Long, seq: Long, durationMs: Long): String =
    s"""{"stream_id":"$streamId","chunk_index":$idx,"sequence_number":$seq,""" +
      s""""timestamp":"2026-01-01T00:00:00+00:00","size_bytes":${500000 + idx},""" +
      s""""stream_type":"live","status":"received","checksum":"c$idx",""" +
      s""""duration_ms":$durationMs,"keyframe_aligned":true,""" +
      s""""audio_track_id":"aud","video_track_id":"vid"}"""

  test("FileObjectStore: put/get/keys round-trip, sidecars hidden, content-type kept") {
    val root = Files.createTempDirectory("graft-fos").toString
    val store = new Sinks.FileObjectStore(root)
    store.put("bucket-a", "s1/chunks/0.ts", "body0".getBytes, "video/mp2t",
      Map("stream_id" -> "s1"))
    store.put("bucket-a", "s1/manifest.m3u8", "#EXTM3U\n".getBytes,
      "application/vnd.apple.mpegurl", Map.empty)
    assert(new String(store.get("bucket-a", "s1/chunks/0.ts").get) === "body0")
    assert(store.get("bucket-a", "missing").isEmpty)
    assert(store.keys("bucket-a") === Seq("s1/chunks/0.ts", "s1/manifest.m3u8"))
    assert(store.keys("no-such-bucket").isEmpty)
    assert(store.contentType("bucket-a", "s1/manifest.m3u8").get ===
      "application/vnd.apple.mpegurl")
    // overwrite is idempotent and total
    store.put("bucket-a", "s1/chunks/0.ts", "body0".getBytes, "video/mp2t",
      Map("stream_id" -> "s1"))
    assert(store.keys("bucket-a").size === 2)
    // durability: a fresh handle over the same root sees everything
    val again = new Sinks.FileObjectStore(root)
    assert(new String(again.get("bucket-a", "s1/chunks/0.ts").get) === "body0")
  }

  test("FileMetadataSink: $set-merge upsert, find/findLatest/count, durable across handles") {
    val root = Files.createTempDirectory("graft-fms").toString
    val sink = new Sinks.FileMetadataSink(root)
    sink.upsert("live_metadata", "s1", 0L, Map("status" -> "received", "a" -> "1"))
    sink.upsert("live_metadata", "s1", 0L, Map("status" -> "live")) // $set semantics
    sink.upsert("live_metadata", "s1", 3L, Map("status" -> "live", "has_manifest" -> "y"))
    sink.upsert("live_metadata", "s2", 9L, Map("status" -> "live"))
    assert(sink.find("live_metadata", "s1", 0L).get ===
      Map("status" -> "live", "a" -> "1"))
    assert(sink.find("live_metadata", "s1", 7L).isEmpty)
    assert(sink.findLatest("live_metadata", "s1").get("has_manifest") === "y")
    assert(sink.findLatest("live_metadata", "s1",
      _.contains("a")).get("status") === "live")
    assert(sink.count("live_metadata") === 3L)
    assert(sink.count("vod_metadata") === 0L)
    val again = new Sinks.FileMetadataSink(root)
    assert(again.count("live_metadata") === 3L)
  }

  test("HadoopObjectStore: same contract as FileObjectStore over a file: URI") {
    // file:/ here; s3a://bucket + fs.s3a.* conf on a real cluster — the code
    // path is identical, only the FileSystem behind the URI changes. Given
    // an s3a-capable environment, THIS test (plus the replay test below,
    // swapping the store) is the store's full contract.
    val root = Files.createTempDirectory("graft-hos").toUri.toString
    val store = new Sinks.HadoopObjectStore(root)
    store.put("bucket-a", "s1/chunks/0.ts", "body0".getBytes, "video/mp2t",
      Map("stream_id" -> "s1"))
    store.put("bucket-a", "s1/manifest.m3u8", "#EXTM3U\n".getBytes,
      "application/vnd.apple.mpegurl", Map.empty)
    assert(new String(store.get("bucket-a", "s1/chunks/0.ts").get) === "body0")
    assert(store.get("bucket-a", "missing").isEmpty)
    assert(store.keys("bucket-a") === Seq("s1/chunks/0.ts", "s1/manifest.m3u8"))
    assert(store.keys("no-such-bucket").isEmpty)
    assert(store.contentType("bucket-a", "s1/manifest.m3u8").get ===
      "application/vnd.apple.mpegurl")
    // whole-object overwrite is idempotent (replay contract)
    store.put("bucket-a", "s1/chunks/0.ts", "body0".getBytes, "video/mp2t",
      Map("stream_id" -> "s1"))
    assert(store.keys("bucket-a").size === 2)
    // durability: a fresh handle (fresh FileSystem client) sees everything
    val again = new Sinks.HadoopObjectStore(root)
    assert(new String(again.get("bucket-a", "s1/chunks/0.ts").get) === "body0")
    // traversal guard
    intercept[IllegalArgumentException] {
      store.put("b", "../../escape.ts", Array.emptyByteArray, "x", Map.empty)
    }
    // the handle survives serialization (executors deserialize it and build
    // their own client — the per-partition-singleton pattern)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(store)
    val thawed = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Sinks.HadoopObjectStore]
    assert(new String(thawed.get("bucket-a", "s1/chunks/0.ts").get) === "body0")
  }

  test("replay idempotency holds for HadoopObjectStore-delivered live results") {
    val objects = new Sinks.HadoopObjectStore(
      Files.createTempDirectory("graft-hos-r").toUri.toString)
    val meta = new Sinks.FileMetadataSink(Files.createTempDirectory("graft-hms-r").toString)
    val ts = Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    val rows = (0L to 2L).map { i =>
      LiveResult("stream-h", i, i, ts, 1000, "live", s"c$i", 3000, true,
        "aud", "vid", checksum_ok = true, gap_size = 0,
        chunk_path = s"live-streams/stream-h/chunks/$i.ts",
        manifest_path = "manifests/stream-h/live_manifest.m3u8",
        manifest = s"#EXTM3U\nfake-$i\n", dvr_window_start = 0)
    }
    Sinks.deliverLive(rows.iterator, objects, meta)
    val snapManifest = objects.getString("manifests", "stream-h/live_manifest.m3u8")
    val snapKeys = objects.keys("live-streams")
    Sinks.deliverLive(rows.iterator, objects, meta) // replay the whole batch
    assert(objects.getString("manifests", "stream-h/live_manifest.m3u8") === snapManifest)
    assert(objects.keys("live-streams") === snapKeys)
  }

  test("JdbcMetadataSink: MetadataSink contract over embedded Derby") {
    // jdbc:derby here; jdbc:postgresql/... in a deployment — identical code
    val db = Files.createTempDirectory("graft-jdbc").resolve("meta")
    val sink = new Sinks.JdbcMetadataSink(s"jdbc:derby:$db;create=true")
    sink.upsert("live_metadata", "s1", 0L, Map("status" -> "received", "a" -> "1"))
    sink.upsert("live_metadata", "s1", 0L, Map("status" -> "live")) // $set merge
    sink.upsert("live_metadata", "s1", 3L, Map("status" -> "live", "has_manifest" -> "y"))
    sink.upsert("live_metadata", "s2", 9L, Map("status" -> "live"))
    assert(sink.find("live_metadata", "s1", 0L).get ===
      Map("status" -> "live", "a" -> "1"))
    assert(sink.find("live_metadata", "s1", 7L).isEmpty)
    assert(sink.findLatest("live_metadata", "s1").get("has_manifest") === "y")
    assert(sink.findLatest("live_metadata", "s1",
      _.contains("a")).get("status") === "live")
    assert(sink.count("live_metadata") === 3L)
    assert(sink.count("vod_metadata") === 0L)
    // durable across handles: a fresh sink (fresh connection) sees all rows
    val again = new Sinks.JdbcMetadataSink(s"jdbc:derby:$db")
    assert(again.count("live_metadata") === 3L)
    assert(again.find("live_metadata", "s2", 9L).get("status") === "live")
    // serializable handle (per-partition-singleton pattern)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(sink)
    val thawed = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Sinks.JdbcMetadataSink]
    assert(thawed.count("live_metadata") === 3L)
    // true per-JVM singleton: same URL -> same Connection object, so a
    // re-deserialized sink per task does NOT open (and leak) a new one
    assert(Sinks.JdbcMetadataSink.connectionFor(s"jdbc:derby:$db;create=true") eq
      Sinks.JdbcMetadataSink.connectionFor(s"jdbc:derby:$db;create=true"))
  }

  test("checkpoint restart against the JDBC sink: no duplicate delivery, merge intact") {
    val db = Files.createTempDirectory("graft-jdbc-c").resolve("meta")
    val objects = new Sinks.FileObjectStore(Files.createTempDirectory("graft-fos-j").toString)
    val meta = new Sinks.JdbcMetadataSink(s"jdbc:derby:$db;create=true")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[String]
    val ckpt = Files.createTempDirectory("ckpt-jdbc-restart").toString

    val q1 = Pipelines.startLive(StreamSources.frames(stream.toDF()), objects, meta,
      ckpt, trigger = Trigger.ProcessingTime(0), queryName = "live-jdbc-a")
    try {
      stream.addData((0L to 4L).map(i => eventJson("stream-j", i, i, 3000)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(meta.count("live_metadata") === 5L)

    val q2 = Pipelines.startLive(StreamSources.frames(stream.toDF()), objects, meta,
      ckpt, trigger = Trigger.ProcessingTime(0), queryName = "live-jdbc-b")
    try {
      stream.addData(Seq(eventJson("stream-j", 7, 7, 3000)))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(meta.count("live_metadata") === 6L, "no chunk re-delivered to the sink")
    assert(meta.find("live_metadata", "stream-j", 7L).get("sequence_number") === "7")
    assert(meta.findLatest("live_metadata", "stream-j").get("chunk_index") === "7")
  }

  test("chaos: task killed mid-foreachPartition delivery still converges to exactly-once") {
    // UNPLANNED failure, not a planned replay: the object store throws from
    // inside put() partway through the partition on the task's FIRST
    // attempt (after one row is fully delivered and the next row's chunk is
    // mid-flight), so Spark kills the task and re-runs it (master is
    // local[4, 2] -> one retry). The partial first-attempt writes must be
    // absorbed by the idempotent-overwrite/upsert contract: after the retry
    // the object store and the transactional JDBC metadata table hold
    // EXACTLY the clean-run state — no missing chunk, no duplicate, no
    // half-written metadata row.
    val db = Files.createTempDirectory("graft-jdbc-x").resolve("meta")
    val inner = new Sinks.FileObjectStore(Files.createTempDirectory("graft-fos-x").toString)
    val objects = new ChaosObjectStore(inner)
    val meta = new Sinks.JdbcMetadataSink(s"jdbc:derby:$db;create=true")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[String]
    val ckpt = Files.createTempDirectory("ckpt-chaos").toString

    ChaosObjectStore.reset(failOnPut = 3) // row 0 delivered, row 1 chunk mid-flight
    val q = Pipelines.startLive(StreamSources.frames(stream.toDF()), objects, meta,
      ckpt, trigger = Trigger.ProcessingTime(0), queryName = "live-chaos")
    try {
      stream.addData((0L to 2L).map(i => eventJson("stream-x", i, i, 3000)))
      q.processAllAvailable()
    } finally q.stop()

    assert(ChaosObjectStore.fired.get(), "chaos fault was injected on attempt 0")
    assert(ChaosObjectStore.maxAttemptSeen.get() >= 1, "the task actually re-ran")
    // exactly-once convergence: the retry's full redelivery overwrote the
    // partial attempt; nothing is missing, nothing doubled
    assert(meta.count("live_metadata") === 3L)
    (0L to 2L).foreach { i =>
      val doc = meta.find("live_metadata", "stream-x", i).get
      assert(doc("status") === "live")
      assert(doc("sequence_number") === i.toString)
    }
    assert(inner.keys("live-streams") ===
      (0L to 2L).map(i => s"stream-x/chunks/$i.ts"))
    val expected = ManifestFunctions.buildLiveManifest(
      (0L to 2L).map(i => Segment(3.0, s"stream-x/chunks/$i.ts")),
      latestChunkIndex = 2L)
    assert(inner.getString("manifests", "stream-x/live_manifest.m3u8").get === expected)
  }

  test("file stores reject path-traversal keys and stream ids") {
    val store = new Sinks.FileObjectStore(Files.createTempDirectory("graft-fos-t").toString)
    intercept[IllegalArgumentException] {
      store.put("b", "../../escape.ts", Array.emptyByteArray, "x", Map.empty)
    }
    val sink = new Sinks.FileMetadataSink(Files.createTempDirectory("graft-fms-t").toString)
    intercept[IllegalArgumentException] {
      sink.upsert("t", "../../escape", 0L, Map("a" -> "b"))
    }
  }

  test("replay idempotency holds for the file stores (same contract as in-memory)") {
    val objects = new Sinks.FileObjectStore(Files.createTempDirectory("graft-fos-r").toString)
    val meta = new Sinks.FileMetadataSink(Files.createTempDirectory("graft-fms-r").toString)
    val ts = Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    val rows = (0L to 2L).map { i =>
      LiveResult("stream-r", i, i, ts, 1000, "live", s"c$i", 3000, true,
        "aud", "vid", checksum_ok = true, gap_size = 0,
        chunk_path = s"live-streams/stream-r/chunks/$i.ts",
        manifest_path = "manifests/stream-r/live_manifest.m3u8",
        manifest = s"#EXTM3U\nfake-$i\n", dvr_window_start = 0)
    }
    Sinks.deliverLive(rows.iterator, objects, meta)
    val snapMeta = (0L to 2L).map(i => meta.find("live_metadata", "stream-r", i))
    val snapManifest = objects.getString("manifests", "stream-r/live_manifest.m3u8")
    val snapKeys = objects.keys("live-streams")

    Sinks.deliverLive(rows.iterator, objects, meta) // replay the whole batch
    assert((0L to 2L).map(i => meta.find("live_metadata", "stream-r", i)) === snapMeta)
    assert(objects.getString("manifests", "stream-r/live_manifest.m3u8") === snapManifest)
    assert(objects.keys("live-streams") === snapKeys)
    assert(meta.count("live_metadata") === 3L)
  }

  test("checkpoint restart against file stores: state survives, no duplicate delivery") {
    val metaRoot = Files.createTempDirectory("graft-fms-c").toString
    val objects = new Sinks.FileObjectStore(Files.createTempDirectory("graft-fos-c").toString)
    val meta = new Sinks.FileMetadataSink(metaRoot)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[String]
    val ckpt = Files.createTempDirectory("ckpt-file-restart").toString

    val q1 = Pipelines.startLive(StreamSources.frames(stream.toDF()), objects, meta,
      ckpt, trigger = Trigger.ProcessingTime(0), queryName = "live-fs-a")
    try {
      stream.addData((0L to 4L).map(i => eventJson("stream-f", i, i, 3000)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(meta.count("live_metadata") === 5L)

    val q2 = Pipelines.startLive(StreamSources.frames(stream.toDF()), objects, meta,
      ckpt, trigger = Trigger.ProcessingTime(0), queryName = "live-fs-b")
    try {
      stream.addData(Seq(eventJson("stream-f", 7, 7, 3000)))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(meta.count("live_metadata") === 6L, "no chunk re-delivered to the sink")
    assert(meta.find("live_metadata", "stream-f", 7L).get("sequence_number") === "7")
    // manifest window carried across the restart: all six chunks, in order
    val expected = ManifestFunctions.buildLiveManifest(
      Seq(0L, 1L, 2L, 3L, 4L, 7L).map(i => Segment(3.0, s"stream-f/chunks/$i.ts")),
      latestChunkIndex = 7L)
    assert(objects.getString("manifests", "stream-f/live_manifest.m3u8").get === expected)
    // and the metadata table is Spark-readable for batch post-processing
    import spark.implicits._
    val df = spark.read.option("recursiveFileLookup", "true")
      .json(s"$metaRoot/live_metadata")
    assert(df.count() === 6L)
    assert(df.select($"chunk_index".cast("long")).as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L, 4L, 7L))
  }
}
