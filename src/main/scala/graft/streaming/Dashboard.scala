package graft.streaming

import scala.jdk.CollectionConverters._

/** Driver-side analogues of the reference Grafana dashboard's engine panels
  * (grafana/provisioning/dashboards/pipeline_dashboard.json): PromQL
  * `rate()` and `histogram_quantile()` over an in-process time series of
  * the metrics registry, recorded per micro-batch by
  * [[Metrics.ProgressListener]]. The infra panels (Kafka exporter, MongoDB,
  * FastAPI) belong to services this library replaces or does not ship; the
  * MinIO usage panels are served from the ObjectStore seam.
  *
  * Semantics follow PromQL:
  *  - rate(c[w])  = (latest - earliest-in-window) / elapsed, per second;
  *    0 until two samples span the window (counters only go up here — the
  *    registry lives as long as the process, so no reset handling).
  *  - histogram_quantile(q, rate(bucket[w])): per-bucket increase over the
  *    window, cumulative; find the bucket where cumulative crosses
  *    q * total, linear-interpolate within its bounds (first bucket lower
  *    bound 0, +Inf bucket clamps to the highest finite edge).
  */
object Dashboard {

  final case class Sample(
      tsMs: Long,
      counters: Map[String, Long],
      buckets: Map[String, Seq[(Double, Long)]])

  final class Series(maxSamples: Int = 1024) {
    private val samples = new java.util.concurrent.ConcurrentLinkedDeque[Sample]()

    def record(tsMs: Long = System.currentTimeMillis()): Unit =
      record(Sample(tsMs, Metrics.snapshot,
        Map("live" -> Metrics.latencyHistogram("live"),
            "vod" -> Metrics.latencyHistogram("vod"))))

    def record(s: Sample): Unit = {
      samples.addLast(s)
      while (samples.size > maxSamples) samples.pollFirst()
    }

    def clear(): Unit = samples.clear()

    private def window(windowMs: Long, nowMs: Long): Option[(Sample, Sample)] = {
      val all = samples.iterator().asScala.toSeq
      val inWin = all.filter(s => s.tsMs >= nowMs - windowMs && s.tsMs <= nowMs)
      if (inWin.size < 2) None else Some((inWin.head, inWin.last))
    }

    /** PromQL rate(counter[window]) in events/second. */
    def rate(counter: String, windowMs: Long,
        nowMs: Long = System.currentTimeMillis()): Double =
      window(windowMs, nowMs) match {
        case Some((first, last)) if last.tsMs > first.tsMs =>
          val d = last.counters.getOrElse(counter, 0L) -
            first.counters.getOrElse(counter, 0L)
          math.max(0L, d).toDouble / ((last.tsMs - first.tsMs) / 1000.0)
        case _ => 0.0
      }

    /** PromQL histogram_quantile(q, rate(..._bucket{stream_type}[window])),
      * in the bucket unit (seconds). NaN when the window has no increase. */
    def histogramQuantile(q: Double, streamType: String, windowMs: Long,
        nowMs: Long = System.currentTimeMillis()): Double =
      window(windowMs, nowMs) match {
        case Some((first, last)) =>
          val f = first.buckets.getOrElse(streamType, Seq.empty).toMap
          val l = last.buckets.getOrElse(streamType, Seq.empty)
          if (l.isEmpty) Double.NaN
          else {
            // cumulative increase per le over the window
            val inc = l.map { case (le, n) => le -> math.max(0L, n - f.getOrElse(le, 0L)) }
            val total = inc.last._2.toDouble
            if (total <= 0.0) Double.NaN
            else {
              val target = q * total
              val idx = inc.indexWhere(_._2 >= target)
              val (le, cum) = inc(idx)
              if (le.isPosInfinity) inc(idx - 1)._1 // clamp to highest finite edge
              else {
                val (lo, cumLo) =
                  if (idx == 0) (0.0, 0L) else (inc(idx - 1)._1, inc(idx - 1)._2)
                if (cum == cumLo) le
                else lo + (le - lo) * (target - cumLo) / (cum - cumLo).toDouble
              }
            }
          }
        case None => Double.NaN
      }
  }

  /** Process-wide series, recorded by Metrics.ProgressListener. */
  val series = new Series()

  /** The engine panels of the reference dashboard, evaluated at `nowMs`.
    * Values are (panel title, value) with the reference's units (latency
    * panels in milliseconds — the dashboard multiplies by 1000). */
  def panels(windowMs: Long = 60000L,
      nowMs: Long = System.currentTimeMillis()): Seq[(String, Double)] = Seq(
    "Live Latency p99 (ms)" ->
      series.histogramQuantile(0.99, "live", windowMs, nowMs) * 1000.0,
    "Live Latency p50 (ms)" ->
      series.histogramQuantile(0.50, "live", windowMs, nowMs) * 1000.0,
    "VOD Latency p95 (ms)" ->
      series.histogramQuantile(0.95, "vod", windowMs * 5, nowMs) * 1000.0,
    "Live: Spark Processing Rate (/s)" ->
      series.rate("spark_live_chunks_processed_total", windowMs, nowMs),
    "VOD: Processing Rate (/s)" ->
      series.rate("spark_vod_chunks_processed_total", windowMs, nowMs),
    "VOD: Variants Generated Rate (/s)" ->
      series.rate("spark_vod_variants_generated_total", windowMs, nowMs),
    "Checksum Failure Rate (/s)" ->
      (series.rate("chunk_checksum_failures_total{stream_type=live}", windowMs * 5, nowMs) +
        series.rate("chunk_checksum_failures_total{stream_type=vod}", windowMs * 5, nowMs)),
    "Live: Chunk Gaps Detected (Total)" ->
      Metrics.counter("live_chunk_gaps_total").toDouble,
    "Checksum Failures (Total)" ->
      (Metrics.counter("chunk_checksum_failures_total{stream_type=live}") +
        Metrics.counter("chunk_checksum_failures_total{stream_type=vod}")).toDouble,
    "Active Live Streams" -> Metrics.activeLiveStreams.toDouble)

  /** MinIO-usage panel analogues from the ObjectStore seam. */
  def storagePanels(objects: Sinks.ObjectStore,
      buckets: Seq[String]): Seq[(String, Long, Long)] =
    buckets.map { b =>
      val ks = objects.keys(b)
      val bytes = ks.flatMap(k => objects.get(b, k)).map(_.length.toLong).sum
      (b, ks.size.toLong, bytes)
    }

  /** Summed PromQL-style rate over every registry counter whose name starts
    * with `prefix` — the `sum(rate(name_total[w]))` form the dashboard uses
    * for labeled counter families (api_requests_total{endpoint,...}). */
  def rateSum(prefix: String, windowMs: Long,
      nowMs: Long = System.currentTimeMillis()): Double =
    // toSeq: Map.keys is a SET — equal per-series rates would dedup before
    // the sum (two endpoints at 0.5/s must report 1.0/s, not 0.5)
    Metrics.snapshot.keys.toSeq.filter(_.startsWith(prefix))
      .map(series.rate(_, windowMs, nowMs)).sum

  /** histogram_quantile over the CUMULATIVE API-duration histogram, summed
    * across endpoints (the dashboard's un-labeled
    * `histogram_quantile(0.95, rate(api_request_duration_seconds_bucket[1m]))`
    * — the registry keeps totals rather than a windowed series for API
    * calls, so this is the all-time quantile; NaN with no observations). */
  def apiDurationQuantile(q: Double, endpoints: Seq[String]): Double = {
    // q outside (0,1) would make indexWhere miss (target > total) or land
    // on the +Inf bucket at idx 0 — both out-of-contract, fail loudly
    require(q > 0.0 && q < 1.0, s"quantile must be in (0,1), got $q")
    val hists = endpoints.map(Metrics.apiDurationHistogram)
    if (hists.isEmpty) return Double.NaN
    val summed = hists.head.indices.map { i =>
      (hists.head(i)._1, hists.map(_(i)._2).sum)
    }
    val total = summed.last._2.toDouble
    if (total <= 0.0) return Double.NaN
    val target = q * total
    val idx = summed.indexWhere(_._2 >= target)
    val (le, cum) = summed(idx)
    if (le.isPosInfinity) summed(idx - 1)._1
    else {
      val (lo, cumLo) =
        if (idx == 0) (0.0, 0L) else (summed(idx - 1)._1, summed(idx - 1)._2)
      if (cum == cumLo) le
      else lo + (le - lo) * (target - cumLo) / (cum - cumLo).toDouble
    }
  }

  /** One reference dashboard panel → the engine query/API that serves it.
    * `value` is a live in-process evaluator where the registry answers
    * directly; None where the panel needs a handle (ObjectStore buckets),
    * belongs to replaced infrastructure, or is Kafka-execution-blocked in
    * this environment (DEVIATIONS #11). */
  final case class PanelMapping(
      panel: String,
      promExpr: String,
      servedBy: String,
      value: Option[() => Double])

  /** EVERY non-row panel of the reference dashboard
    * (grafana/provisioning/dashboards/pipeline_dashboard.json — 23 panels
    * under 9 row headers), each mapped to its engine analogue.
    * DashboardSpec pins the catalog against the reference's exact panel
    * titles, so a dashboard edit in a future reference version surfaces as
    * a test diff, not silent drift. */
  def panelCatalog(windowMs: Long = 60000L,
      nowMs: Long = System.currentTimeMillis()): Seq[PanelMapping] = {
    def now = nowMs
    Seq(
      PanelMapping("Kafka Consumer Lag",
        """max(kafka_consumergroup_lag{topic=~"vod-chunks|live-chunks"}) or vector(0)""",
        "StreamingQueryProgress sources (latestOffset - endOffset) once a " +
          "Kafka connector jar is present; Kafka execution env-blocked " +
          "(DEVIATIONS #11). Zero-lag is pinned by StreamBench rate-matching.",
        None),
      PanelMapping("Live Latency p99",
        """histogram_quantile(0.99, rate(chunk_processing_latency_seconds_bucket{stream_type="live"}[1m])) * 1000""",
        "Dashboard.series.histogramQuantile(0.99, \"live\") over the " +
          "listener-fed registry; event-time form: Pipelines.windowedTelemetry p99",
        Some(() => series.histogramQuantile(0.99, "live", windowMs, now) * 1000.0)),
      PanelMapping("VOD Latency p95",
        """histogram_quantile(0.95, rate(chunk_processing_latency_seconds_bucket{stream_type="vod"}[5m])) * 1000""",
        "Dashboard.series.histogramQuantile(0.95, \"vod\")",
        Some(() => series.histogramQuantile(0.95, "vod", windowMs * 5, now) * 1000.0)),
      PanelMapping("Checksum Failures/s",
        "sum(rate(chunk_checksum_failures_total[5m]))",
        "Dashboard.series.rate over both stream_type label values",
        Some(() =>
          series.rate("chunk_checksum_failures_total{stream_type=live}", windowMs * 5, now) +
            series.rate("chunk_checksum_failures_total{stream_type=vod}", windowMs * 5, now))),
      PanelMapping("Active Live Streams",
        "spark_active_live_streams",
        "Metrics.activeLiveStreams (replay-idempotent new_streams feed); " +
          "event-time windowed form: windowedTelemetry distinct_streams_est (HLL)",
        Some(() => Metrics.activeLiveStreams.toDouble)),
      PanelMapping("Services Healthy",
        "sum(up)",
        "not applicable: the engine is an in-process library, not a " +
          "service fleet (no scrape targets)",
        None),
      PanelMapping("Kafka: Messages per Second per Topic",
        """rate(kafka_topic_partition_current_offset{topic=~"vod-chunks|live-chunks"}[1m])""",
        "at zero lag equals the processing rate: Dashboard.series.rate of " +
          "spark_{live,vod}_chunks_processed_total; exporter-side metric " +
          "otherwise env-blocked",
        Some(() =>
          series.rate("spark_live_chunks_processed_total", windowMs, now) +
            series.rate("spark_vod_chunks_processed_total", windowMs, now))),
      PanelMapping("Kafka: Consumer Group Lag",
        "kafka_consumergroup_lag",
        "same as 'Kafka Consumer Lag' (env-blocked; progress-based once a " +
          "connector jar is present)",
        None),
      PanelMapping("Producer: Messages/sec by Stream Type",
        "rate(producer_messages_total[1m])",
        "the reference's producer app is replaced by " +
          "StreamSources.syntheticEvents (deterministic generator); its " +
          "emitted rate equals the per-type processing rate at zero lag",
        Some(() =>
          series.rate("spark_live_chunks_processed_total", windowMs, now) +
            series.rate("spark_vod_chunks_processed_total", windowMs, now))),
      PanelMapping("Producer: Simulated Throughput (bytes/sec)",
        "rate(producer_bytes_simulated_total[1m])",
        "Pipelines.windowedTelemetry `bytes` per window / window seconds " +
          "(event-time, exact — not a scrape-window estimate)",
        None),
      PanelMapping("Live: Chunk Gaps Detected (Total)",
        "live_chunk_gaps_total",
        "Metrics.counter(\"live_chunk_gaps_total\") (missing-chunk count, A1)",
        Some(() => Metrics.counter("live_chunk_gaps_total").toDouble)),
      PanelMapping("Live: Chunk Processing Latency  [orange=500ms  red=1s]",
        """histogram_quantile(0.99, rate(chunk_processing_latency_seconds_bucket{stream_type="live"}[1m])) * 1000""",
        "Dashboard.series.histogramQuantile(0.99/0.50, \"live\") — both targets",
        Some(() => series.histogramQuantile(0.99, "live", windowMs, now) * 1000.0)),
      PanelMapping("Live: Spark Processing Rate",
        "rate(spark_live_chunks_processed_total[1m])",
        "Dashboard.series.rate(\"spark_live_chunks_processed_total\")",
        Some(() => series.rate("spark_live_chunks_processed_total", windowMs, now))),
      PanelMapping("VOD: Processing Latency  [orange=15s  red=30s]",
        """histogram_quantile(0.95, rate(chunk_processing_latency_seconds_bucket{stream_type="vod"}[5m])) * 1000""",
        "Dashboard.series.histogramQuantile(0.95/0.50, \"vod\") — both targets",
        Some(() => series.histogramQuantile(0.95, "vod", windowMs * 5, now) * 1000.0)),
      PanelMapping("VOD: Processing Rate & Variants Generated",
        "rate(spark_vod_variants_generated_total[1m])",
        "Dashboard.series.rate of spark_vod_variants_generated_total and " +
          "spark_vod_chunks_processed_total — both targets",
        Some(() => series.rate("spark_vod_variants_generated_total", windowMs, now))),
      PanelMapping("Checksum Failures (Total)",
        "chunk_checksum_failures_total",
        "Metrics.counter over both stream_type label values",
        Some(() =>
          (Metrics.counter("chunk_checksum_failures_total{stream_type=live}") +
            Metrics.counter("chunk_checksum_failures_total{stream_type=vod}")).toDouble)),
      PanelMapping("Checksum Failure Rate  [orange=0.04/s  red=0.08/s]",
        "rate(chunk_checksum_failures_total[5m])",
        "Dashboard.series.rate over both stream_type label values",
        Some(() =>
          series.rate("chunk_checksum_failures_total{stream_type=live}", windowMs * 5, now) +
            series.rate("chunk_checksum_failures_total{stream_type=vod}", windowMs * 5, now))),
      PanelMapping("MongoDB: Operations per Second",
        """rate(mongodb_op_counters_total{type="insert"}[1m])""",
        "the MetadataSink upsert rate: exactly one idempotent upsert per " +
          "processed chunk (K4), so rate(spark_{live,vod}_chunks_processed_" +
          "total) IS the sink op rate — counted on the listener channel, " +
          "never executor-side",
        Some(() =>
          series.rate("spark_live_chunks_processed_total", windowMs, now) +
            series.rate("spark_vod_chunks_processed_total", windowMs, now))),
      PanelMapping("MongoDB: Current Connections",
        """mongodb_connections{state="current"}""",
        "not applicable: the metadata sink is in-process (file/JDBC seam); " +
          "no connection pool to gauge",
        None),
      PanelMapping("FastAPI: Request Rate",
        "rate(api_requests_total[1m])",
        "Dashboard.rateSum(\"api_requests_total{\") over the labeled " +
          "ControlPlane counters",
        Some(() => rateSum("api_requests_total{", windowMs, now))),
      PanelMapping("FastAPI: p95 Response Time  [orange=0.5s  red=2s]",
        "histogram_quantile(0.95, rate(api_request_duration_seconds_bucket[1m]))",
        "Dashboard.apiDurationQuantile(0.95, endpoints) over " +
          "Metrics.apiDurationHistogram (prometheus_client default buckets)",
        None),
      PanelMapping("MinIO: Storage Used per Bucket",
        "minio_bucket_usage_total_bytes",
        "Dashboard.storagePanels(objectStore, buckets) — bytes column",
        None),
      PanelMapping("MinIO: Object Count per Bucket",
        "minio_bucket_objects_count",
        "Dashboard.storagePanels(objectStore, buckets) — object-count column",
        None))
  }
}
