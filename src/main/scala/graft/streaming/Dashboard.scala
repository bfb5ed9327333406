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
}
