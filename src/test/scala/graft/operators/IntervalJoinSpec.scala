package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketized interval join vs a reference theta join: exact pair parity
  * (including bucket-boundary cases), no duplicate emission across
  * multi-bucket intervals, and the hash-join plan shape. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val intervals = Seq(
    // spans 3 hour-buckets
    (1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:30:00")),
    // single bucket
    (2L, ts("2024-01-01 05:10:00"), ts("2024-01-01 05:20:00")),
    // degenerate: end < start — must match nothing
    (3L, ts("2024-01-01 09:00:00"), ts("2024-01-01 08:00:00")),
    // zero-length: start == end, inclusive bounds keep the exact hit
    (4L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"))
  ).toDF("iv_id", "start_ts", "end_ts")

  private val points = Seq(
    (10L, 1L, ts("2024-01-01 00:30:00")), // == start, inclusive
    (11L, 1L, ts("2024-01-01 01:59:59")), // mid-interval, different bucket
    (12L, 1L, ts("2024-01-01 02:30:00")), // == end, inclusive
    (13L, 1L, ts("2024-01-01 02:30:01")), // 1s past end, same bucket -> out
    (14L, 1L, ts("2024-01-01 00:29:59")), // 1s before start, same bucket -> out
    (15L, 2L, ts("2024-01-01 05:15:00")),
    (16L, 9L, ts("2024-01-01 01:00:00")), // key mismatch -> out
    (17L, 3L, ts("2024-01-01 08:30:00")), // inside reversed interval -> out
    (18L, 4L, ts("2024-01-01 12:00:00"))  // exact zero-length hit
  ).toDF("p_id", "key", "ts")

  private def run() = IntervalJoin.bucketedIntervalJoin(
    intervals, points, "start_ts", "end_ts", "ts",
    equiKeys = Seq("iv_id" -> "key"), bucketSeconds = 3600L)

  test("matches exactly the theta-join pairs, inclusive bounds, once each") {
    val got = run().select($"iv_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val expected = intervals.as("i").join(points.as("p"),
        $"i.iv_id" === $"p.key" && $"p.ts" >= $"i.start_ts" && $"p.ts" <= $"i.end_ts")
      .select($"iv_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === expected.toSeq)
    assert(got.toSeq === Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 15L), (4L, 18L)))
    assert(got.length === got.distinct.length, "no duplicate pair emission")
  }

  test("bucket width does not change the result set") {
    val wide = IntervalJoin.bucketedIntervalJoin(intervals, points,
        "start_ts", "end_ts", "ts", Seq("iv_id" -> "key"), bucketSeconds = 86400L)
      .select($"iv_id", $"p_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val narrow = IntervalJoin.bucketedIntervalJoin(intervals, points,
        "start_ts", "end_ts", "ts", Seq("iv_id" -> "key"), bucketSeconds = 60L)
      .select($"iv_id", $"p_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(wide.toSeq === narrow.toSeq)
  }

  test("plan is a hash/sort-merge join on the bucket key, not nested-loop") {
    val plan = run().queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must decompose to an equi-join:\n$plan")
  }

  test("without equi keys the bucket alone carries the join") {
    val got = IntervalJoin.bucketedIntervalJoin(
        intervals.filter($"iv_id" === 1L), points.drop("key"),
        "start_ts", "end_ts", "ts", Nil, bucketSeconds = 3600L)
      .select($"p_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(10L, 11L, 12L, 16L)) // key no longer filters p16
  }

  test("output-name collisions are rejected up front, not silently duplicated") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), "x"))
      .toDF("iv_id", "start_ts", "end_ts", "payload")
    val pt = Seq((1L, ts("2024-01-01 00:30:00"), "y")).toDF("key", "ts", "payload")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.bucketedIntervalJoin(iv, pt, "start_ts", "end_ts", "ts",
        Seq("iv_id" -> "key"))
    }
    assert(e.getMessage.contains("payload"))
  }

  test("one corrupt wide interval is dropped by the span cap, not fatal") {
    // end_ts accidentally in year 40000 -> ~3.4e8 hourly buckets
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (2L, ts("2024-01-01 00:00:00"), Timestamp.valueOf("9999-12-31 00:00:00"))
    ).toDF("iv_id", "start_ts", "end_ts")
    val pt = Seq((10L, 1L, ts("2024-01-01 01:00:00")),
      (11L, 2L, ts("2024-01-01 01:00:00"))).toDF("p_id", "key", "ts")
    val res = IntervalJoin.bucketedIntervalJoin(iv, pt, "start_ts", "end_ts", "ts",
        Seq("iv_id" -> "key"), bucketSeconds = 3600L, maxBucketsPerInterval = 1000L)
      .select($"iv_id", $"p_id")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 10L)), "good interval joins; corrupt one dropped")
    // the loss is OBSERVABLE, not silent: the drop count is published as an
    // observed metric on the completed action (r10 advice); the default
    // name carries a uniqueness suffix, so match by prefix
    val metric = res.queryExecution.observedMetrics
      .collectFirst { case (k, v) if k.startsWith("interval_join") => v }.get
    assert(metric.getAs[Long]("dropped_wide_intervals") === 1L)
    // and a FIXED name is available when the caller wants to scrape it
    val named = IntervalJoin.bucketedIntervalJoin(iv, pt, "start_ts", "end_ts", "ts",
        Seq("iv_id" -> "key"), bucketSeconds = 3600L, maxBucketsPerInterval = 1000L,
        metricName = "my_join")
    named.collect()
    assert(named.queryExecution.observedMetrics("my_join")
      .getAs[Long]("dropped_wide_intervals") === 1L)
  }

  test("two interval joins compose in one plan (default observe names are unique)") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("iv_id", "start_ts", "end_ts")
    val pt = Seq((10L, 1L, ts("2024-01-01 01:00:00"))).toDF("p_id", "key", "ts")
    val a = IntervalJoin.bucketedIntervalJoin(iv, pt, "start_ts", "end_ts", "ts",
      Seq("iv_id" -> "key")).select($"iv_id", $"p_id")
    val b = IntervalJoin.bucketedIntervalJoin(iv, pt, "start_ts", "end_ts", "ts",
      Seq("iv_id" -> "key")).select($"iv_id", $"p_id")
    // a fixed default name made this union throw AnalysisException
    // (duplicate observed-metric name) before the sequence suffix
    assert(a.union(b).count() === 2L)
  }

  test("strict mode fails on a wide interval instead of dropping it") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (2L, ts("2024-01-01 00:00:00"), Timestamp.valueOf("9999-12-31 00:00:00"))
    ).toDF("iv_id", "start_ts", "end_ts")
    val pt = Seq((10L, 1L, ts("2024-01-01 01:00:00"))).toDF("p_id", "key", "ts")
    val e = intercept[Exception] {
      IntervalJoin.bucketedIntervalJoin(iv, pt, "start_ts", "end_ts", "ts",
          Seq("iv_id" -> "key"), bucketSeconds = 3600L, maxBucketsPerInterval = 1000L,
          strict = true)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxBucketsPerInterval=1000")),
      s"got: ${messages(e)}")
    // and a clean corpus passes strict mode untouched
    val ok = IntervalJoin.bucketedIntervalJoin(
        iv.filter($"iv_id" === 1L), pt, "start_ts", "end_ts", "ts",
        Seq("iv_id" -> "key"), bucketSeconds = 3600L, maxBucketsPerInterval = 1000L,
        strict = true)
      .select($"iv_id", $"p_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.toSeq === Seq((1L, 10L)))
  }
}
