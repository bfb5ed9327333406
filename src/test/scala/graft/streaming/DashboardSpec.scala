package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the PromQL semantics of the dashboard analogues — rate() and
  * histogram_quantile() over an injected sample series (no wall clock),
  * and the storage panels over an in-memory ObjectStore. Spark-free. */
class DashboardSpec extends AnyFunSuite {

  private def sample(ts: Long, c: Map[String, Long],
      liveBuckets: Seq[(Double, Long)] = Seq.empty): Dashboard.Sample =
    Dashboard.Sample(ts, c, Map("live" -> liveBuckets))

  test("rate(): counter delta over the window span, per second") {
    val s = new Dashboard.Series()
    s.record(sample(0L, Map("c" -> 100L)))
    s.record(sample(60000L, Map("c" -> 220L)))
    // 120 events over 60s = 2/s
    assert(s.rate("c", windowMs = 120000L, nowMs = 60000L) === 2.0)
    // window covering only one sample -> 0
    assert(s.rate("c", windowMs = 1000L, nowMs = 60000L) === 0.0)
    // unknown counter -> 0
    assert(s.rate("zz", windowMs = 120000L, nowMs = 60000L) === 0.0)
  }

  test("rate() uses the earliest sample INSIDE the window (PromQL range selection)") {
    val s = new Dashboard.Series()
    s.record(sample(0L, Map("c" -> 0L)))       // outside the 60s window below
    s.record(sample(30000L, Map("c" -> 30L)))  // earliest in-window
    s.record(sample(90000L, Map("c" -> 90L)))
    // (90-30) / 60s = 1.0, NOT (90-0)/90s
    assert(s.rate("c", windowMs = 60000L, nowMs = 90000L) === 1.0)
  }

  test("histogram_quantile(): linear interpolation inside the crossing bucket") {
    val s = new Dashboard.Series()
    val edges = Metrics.LatencyBuckets
    def cum(perBand: Map[Double, Long]): Seq[(Double, Long)] = {
      var acc = 0L
      edges.map { le => acc += perBand.getOrElse(le, 0L); le -> acc } :+
        (Double.PositiveInfinity -> (acc + perBand.getOrElse(Double.PositiveInfinity, 0L)))
    }
    s.record(sample(0L, Map.empty, cum(Map.empty)))
    // 10 observations landed in (1.0, 2.0] during the window
    s.record(sample(60000L, Map.empty, cum(Map(2.0 -> 10L))))
    val p50 = s.histogramQuantile(0.5, "live", windowMs = 120000L, nowMs = 60000L)
    assert(math.abs(p50 - 1.5) < 1e-9, s"p50 $p50") // 1.0 + (5/10)*(2.0-1.0)
    val p99 = s.histogramQuantile(0.99, "live", windowMs = 120000L, nowMs = 60000L)
    assert(math.abs(p99 - 1.99) < 1e-9, s"p99 $p99")
  }

  test("histogram_quantile(): first bucket interpolates from 0; +Inf clamps; empty is NaN") {
    val s = new Dashboard.Series()
    val edges = Metrics.LatencyBuckets
    def flat(n0: Long, nInf: Long): Seq[(Double, Long)] =
      edges.map(le => le -> n0) :+ (Double.PositiveInfinity -> (n0 + nInf))
    s.record(sample(0L, Map.empty, flat(0L, 0L)))
    s.record(sample(60000L, Map.empty, flat(10L, 0L))) // all 10 in (0, 0.1]
    val p50 = s.histogramQuantile(0.5, "live", 120000L, nowMs = 60000L)
    assert(math.abs(p50 - 0.05) < 1e-9, s"p50 $p50") // 0 + (5/10)*0.1
    val s2 = new Dashboard.Series()
    s2.record(sample(0L, Map.empty, flat(0L, 0L)))
    s2.record(sample(60000L, Map.empty, flat(0L, 10L))) // all beyond 16s
    val p99 = s2.histogramQuantile(0.99, "live", 120000L, nowMs = 60000L)
    assert(p99 === 16.0, "overflow bucket clamps to the highest finite edge")
    assert(s2.histogramQuantile(0.5, "vod", 120000L, nowMs = 60000L).isNaN,
      "no data -> NaN")
  }

  test("series is bounded") {
    val s = new Dashboard.Series(maxSamples = 5)
    (1 to 20).foreach(i => s.record(sample(i * 1000L, Map("c" -> i.toLong))))
    // only the last 5 samples remain: earliest in any window is #16
    assert(s.rate("c", windowMs = 3600000L, nowMs = 20000L) === 1.0)
  }

  test("panelCatalog maps EVERY non-row reference dashboard panel, by exact title") {
    // the 23 non-row panels of grafana/provisioning/dashboards/
    // pipeline_dashboard.json, titles verbatim — a reference dashboard edit
    // must surface here as a diff, not as silent coverage drift
    val referenceTitles = Seq(
      "Kafka Consumer Lag", "Live Latency p99", "VOD Latency p95",
      "Checksum Failures/s", "Active Live Streams", "Services Healthy",
      "Kafka: Messages per Second per Topic", "Kafka: Consumer Group Lag",
      "Producer: Messages/sec by Stream Type",
      "Producer: Simulated Throughput (bytes/sec)",
      "Live: Chunk Gaps Detected (Total)",
      "Live: Chunk Processing Latency  [orange=500ms  red=1s]",
      "Live: Spark Processing Rate",
      "VOD: Processing Latency  [orange=15s  red=30s]",
      "VOD: Processing Rate & Variants Generated",
      "Checksum Failures (Total)",
      "Checksum Failure Rate  [orange=0.04/s  red=0.08/s]",
      "MongoDB: Operations per Second", "MongoDB: Current Connections",
      "FastAPI: Request Rate",
      "FastAPI: p95 Response Time  [orange=0.5s  red=2s]",
      "MinIO: Storage Used per Bucket", "MinIO: Object Count per Bucket")
    val catalog = Dashboard.panelCatalog(nowMs = 0L)
    assert(catalog.map(_.panel) === referenceTitles)
    // every mapping names HOW it is served, and every registry-served panel
    // carries a live evaluator
    assert(catalog.forall(_.servedBy.nonEmpty))
    assert(catalog.forall(_.promExpr.nonEmpty))
    assert(catalog.count(_.value.isDefined) === 15)
  }

  test("panelCatalog evaluators compute from the registry series") {
    Metrics.reset()
    Dashboard.series.clear()
    // two samples 60 s apart: 120 live chunks, 60 vod, 12 checksum fails
    Dashboard.series.record(sample(0L, Map(
      "spark_live_chunks_processed_total" -> 0L,
      "spark_vod_chunks_processed_total" -> 0L,
      "spark_vod_variants_generated_total" -> 0L,
      "chunk_checksum_failures_total{stream_type=live}" -> 0L,
      "chunk_checksum_failures_total{stream_type=vod}" -> 0L)))
    Dashboard.series.record(sample(60000L, Map(
      "spark_live_chunks_processed_total" -> 120L,
      "spark_vod_chunks_processed_total" -> 60L,
      "spark_vod_variants_generated_total" -> 240L,
      "chunk_checksum_failures_total{stream_type=live}" -> 9L,
      "chunk_checksum_failures_total{stream_type=vod}" -> 3L)))
    val byTitle = Dashboard.panelCatalog(windowMs = 120000L, nowMs = 60000L)
      .map(p => p.panel -> p.value).toMap
    def v(t: String): Double = byTitle(t).get.apply()
    assert(v("Live: Spark Processing Rate") === 2.0)
    assert(v("VOD: Processing Rate & Variants Generated") === 4.0)
    assert(v("Kafka: Messages per Second per Topic") === 3.0) // live + vod
    assert(v("MongoDB: Operations per Second") === 3.0) // 1 upsert per chunk
    assert(math.abs(v("Checksum Failures/s") - 0.2) < 1e-9)
    Dashboard.series.clear()
    Metrics.reset()
  }

  test("rateSum and apiDurationQuantile serve the FastAPI panels") {
    Metrics.reset()
    Dashboard.series.clear()
    Dashboard.series.record(sample(0L, Map(
      "api_requests_total{endpoint=/a,method=GET,status=200}" -> 0L,
      "api_requests_total{endpoint=/b,method=POST,status=200}" -> 0L)))
    // registry must contain the counters so rateSum discovers the names
    Metrics.inc("api_requests_total{endpoint=/a,method=GET,status=200}", 30L)
    Metrics.inc("api_requests_total{endpoint=/b,method=POST,status=200}", 30L)
    Dashboard.series.record(sample(60000L, Map(
      "api_requests_total{endpoint=/a,method=GET,status=200}" -> 30L,
      "api_requests_total{endpoint=/b,method=POST,status=200}" -> 30L)))
    assert(Dashboard.rateSum("api_requests_total{", 120000L, nowMs = 60000L) === 1.0)
    // 10 obs in (0.05, 0.1] on /a, 10 in (0.25, 0.5] on /b -> p95 inside
    // /b's bucket: target 19 of 20, cum before 10 -> 0.25 + (9/10)*0.25
    (1 to 10).foreach(_ => Metrics.observeApiDuration("/a", 0.08))
    (1 to 10).foreach(_ => Metrics.observeApiDuration("/b", 0.4))
    val p95 = Dashboard.apiDurationQuantile(0.95, Seq("/a", "/b"))
    assert(math.abs(p95 - (0.25 + 0.9 * 0.25)) < 1e-9, s"p95 $p95")
    assert(Dashboard.apiDurationQuantile(0.95, Seq("/none")).isNaN)
    Dashboard.series.clear()
    Metrics.reset()
  }

  test("storage panels report object counts and byte usage per bucket") {
    Sinks.InMemoryObjectStore.clear("dash-t")
    val store = new Sinks.InMemoryObjectStore("dash-t")
    store.put("live-streams", "s/0.ts", Array.fill(100)(1.toByte), "video/mp2t", Map.empty)
    store.put("live-streams", "s/1.ts", Array.fill(50)(1.toByte), "video/mp2t", Map.empty)
    store.put("manifests", "s/m.m3u8", Array.fill(7)(1.toByte), "x", Map.empty)
    val panels = Dashboard.storagePanels(store, Seq("live-streams", "manifests", "empty"))
    assert(panels === Seq(("live-streams", 2L, 150L), ("manifests", 1L, 7L), ("empty", 0L, 0L)))
  }
}
