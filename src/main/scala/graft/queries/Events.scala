package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch analogues of the reference's streaming operators, on the `events`
  * fixture (event_id ~ sequence number, user_id ~ stream_id, ts ~ event time,
  * value ~ chunk duration). Each pins the exact reference semantics:
  *
  *  - q21: per-key sequence-gap detection (spark_streaming.py:378-385) — a
  *    gap fires only on forward jumps `seq > last+1`, size `seq-last-1`.
  *  - q22: rolling last-N window per key (spark_streaming.py:431-432).
  *  - q23: event-time tumbling window aggregation (generalized T6).
  *  - q24: sessionization by inactivity gap (generalized T6).
  *  - q25: JSON field extraction (the reference decodes JSON per row,
  *    spark_streaming.py:513,536 — here via get_json_object, not a UDF).
  *  - q26: per-key conditional rates (metrics surface A5/A7 generalized).
  *  - q27: the full HLS DVR manifest build (spark_streaming.py:427-449):
  *    header + TARGETDURATION=int(max)+1 + MEDIA-SEQUENCE=max(0,idx-N+1) +
  *    one EXTINF line per windowed segment, as a single declarative query.
  *
  * The streaming (stateful, incremental) forms of q21/q22/q27 live in
  * graft.streaming; these batch forms are the oracle-checkable semantics.
  */
object Events extends QueryModule {

  private val N = 10 // DVR_WINDOW_SIZE default (.env.example:75)

  def defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q21
    QueryDef("q21_gap_detection",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        t(s, dir, "events")
          .withColumn("prev_id", lag($"event_id", 1).over(w))
          .filter($"prev_id".isNotNull && $"event_id" > $"prev_id" + 1)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("gap_events"),
               sum($"event_id" - $"prev_id" - 1).as("missing_seqs"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, count(*) AS gap_events,
        CAST(sum(event_id - prev_id - 1) AS BIGINT) AS missing_seqs
        FROM (SELECT user_id, event_id,
                lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id
              FROM events)
        WHERE prev_id IS NOT NULL AND event_id > prev_id + 1
        GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q22
    QueryDef("q22_last_n_per_key",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= N)
          .select($"user_id", $"rn", $"event_id", $"ts", $"event_type", $"value")
          .orderBy($"user_id", $"rn")
      },
      Some(s"""SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id,
        CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events) WHERE rn <= $N ORDER BY user_id, rn""")),

    // ---------------------------------------------------------------- q23
    QueryDef("q23_tumbling_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
          .agg(count(lit(1)).as("n"),
               sum($"value".cast("decimal(30,6)")).cast("decimal(38,6)")
                 .cast("double").as("total_value"))
          .orderBy($"day", $"event_type")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        count(*) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),

    // ---------------------------------------------------------------- q24
    // Sessions split on >30 min inactivity; session id = running count of
    // session starts in (ts, event_id) order. Microsecond arithmetic on both
    // sides (events ts is truncated ns -> us in Tables).
    QueryDef("q24_sessionization",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        t(s, dir, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_sess",
            when($"prev_ts".isNull ||
                 unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
               min($"event_id").as("first_event"),
               max($"event_id").as("last_event"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH lagged AS (
          SELECT user_id, event_id, ts,
            lag(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
          FROM events),
        flagged AS (
          SELECT user_id, event_id,
            CASE WHEN prev_ts IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev_ts AS TIMESTAMP))
                      > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM lagged),
        sessions AS (
          SELECT user_id, event_id,
            CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, count(*) AS n_events,
          min(event_id) AS first_event, max(event_id) AS last_event
        FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    // ---------------------------------------------------------------- q25
    QueryDef("q25_json_extract",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", get_json_object($"props", "$.k").cast("long").as("k"))
          .filter($"k" > 50)
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events
        WHERE CAST(props->>'k' AS BIGINT) > 50 ORDER BY event_id""")),

    // ---------------------------------------------------------------- q26
    QueryDef("q26_conditional_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy($"user_id")
          .agg(count(when($"event_type" === "click", 1)).as("clicks"),
               count(when($"event_type" === "view", 1)).as("views"),
               count(when($"event_type" === "purchase", 1)).as("purchases"),
               count(when($"event_type" === "error", 1)).as("errors"),
               sum(when($"event_type" === "purchase", $"value").otherwise(0.0)
                 .cast("decimal(30,6)")).cast("decimal(38,6)")
                 .cast("double").as("purchase_value"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS views,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
        CAST(CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
          AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS purchase_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q49
    // The same tumbling aggregation as q23 but through the event-time
    // window() function (A7's real streaming form; epoch-aligned 1-day
    // windows coincide with UTC date_trunc).
    QueryDef("q49_window_fn",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "1 day"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select($"window.start".as("day"), $"event_type", $"n")
          .orderBy($"day", $"event_type")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        count(*) AS n FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),

    // ---------------------------------------------------------------- q50
    // Sessionization via the native session_window() (T6's event-time form;
    // q24 is the explicit window-function build of the same semantics).
    // session end = last event + gap. Boundary note: session_window treats
    // windows as [start, end), so an event at EXACTLY prev+gap starts a new
    // session while the lag-based oracle merges it — unobservable on
    // microsecond-random fixture timestamps.
    QueryDef("q50_session_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy($"user_id", session_window($"ts", "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"session_window.start".as("sess_start"),
            $"session_window.end".as("sess_end"), $"n_events")
          .orderBy($"user_id", $"sess_start")
      },
      Some("""WITH lagged AS (
          SELECT user_id, ts,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events),
        flagged AS (
          SELECT user_id, ts,
            CASE WHEN prev IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev AS TIMESTAMP))
                      > 1800000000 THEN 1 ELSE 0 END AS nf
          FROM lagged),
        sess AS (
          SELECT user_id, ts, sum(nf) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged)
        SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS sess_start,
          CAST(max(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS sess_end,
          count(*) AS n_events
        FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""")),

    // ---------------------------------------------------------------- q28
    // The streaming decode layer (P2 from_json / P3 per-field defaults / P6
    // corrupt isolation) run as a batch query the oracle can check: chunk
    // JSON is synthesized from events rows (some fields withheld to force
    // the reference defaults, ~1% corrupt), decoded by ChunkEvents.decode,
    // and the normalized columns compared to DuckDB's independent expansion.
    QueryDef("q28_chunk_decode",
      (s, dir) => {
        import s.implicits._
        val sid = concat(lit("user-"), $"user_id".cast("string"))
        val frames = t(s, dir, "events").select(
          when($"event_id" % 97 === 0, lit("corrupt {"))
            .otherwise(to_json(struct(
              sid.as("stream_id"),
              $"event_id".as("chunk_index"),
              date_format($"ts", "yyyy-MM-dd'T'HH:mm:ssXXX").as("timestamp"),
              when($"event_id" % 5 === 0, lit(null)).otherwise($"event_id" * 1000).as("size_bytes"),
              when($"event_id" % 3 === 0, lit(null)).otherwise(floor($"value" * 1000)).as("duration_ms"))))
            .as("value"),
          $"ts".as("kafka_timestamp"))
        graft.streaming.ChunkEvents.valid(
            graft.streaming.ChunkEvents.decode(frames, liveDefaults = true))
          .select($"stream_id", $"chunk_index", $"sequence_number", $"event_ts",
            $"size_bytes", $"stream_type", $"status", $"duration_ms",
            $"audio_track_id")
          .orderBy($"stream_id", $"chunk_index")
      },
      Some("""SELECT 'user-' || CAST(user_id AS VARCHAR) AS stream_id,
        event_id AS chunk_index,
        event_id AS sequence_number,
        date_trunc('second', CAST(ts AS TIMESTAMP)) AS event_ts,
        CASE WHEN event_id % 5 = 0 THEN 1000000 ELSE event_id * 1000 END AS size_bytes,
        'live' AS stream_type,
        'received' AS status,
        CASE WHEN event_id % 3 = 0 THEN 3000 ELSE CAST(floor(value * 1000) AS BIGINT) END AS duration_ms,
        'audio-user-' || CAST(user_id AS VARCHAR) AS audio_track_id
        FROM events WHERE event_id % 97 <> 0
        ORDER BY stream_id, chunk_index""")),

    // ---------------------------------------------------------------- q54
    // q27's DVR manifest through the typed ManifestAggregator UDAF instead
    // of window + collect_list: the aggregation buffer is BOUNDED at N
    // segments per group (map-side combined), the scale-correct shape for
    // unbounded chunk histories. Same oracle as q27.
    QueryDef("q54_manifest_agg",
      (s, dir) => {
        import s.implicits._
        val agg = graft.operators.ManifestAggregator.manifestAgg(N)
        t(s, dir, "events")
          .groupBy($"user_id")
          .agg(agg($"event_id", $"value",
            format_string("user-%d/chunks/%d.ts", $"user_id", $"event_id"))
            .as("manifest"))
          .orderBy($"user_id")
      },
      Some(s"""WITH lastn AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events)
        SELECT user_id,
          '#EXTM3U' || e'\\n' || '#EXT-X-VERSION:3' || e'\\n' ||
          '#EXT-X-TARGETDURATION:' || CAST(CAST(floor(max(value)) AS BIGINT) + 1 AS VARCHAR) || e'\\n' ||
          '#EXT-X-PLAYLIST-TYPE:EVENT' || e'\\n' ||
          '#EXT-X-MEDIA-SEQUENCE:' || CAST(greatest(0, max(event_id) - ${N - 1}) AS VARCHAR) || e'\\n' ||
          string_agg(printf('#EXTINF:%.3f,', value) || e'\\n' ||
                     printf('user-%d/chunks/%d.ts', user_id, event_id) || e'\\n',
                     '' ORDER BY event_id) AS manifest
        FROM lastn WHERE rn <= $N GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q27
    QueryDef("q27_dvr_manifest",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= N)
          .groupBy($"user_id")
          .agg(max($"value").as("maxd"),
               max($"event_id").as("maxidx"),
               array_sort(collect_list(struct($"event_id".as("i"), $"value".as("d"))))
                 .as("segs"))
          .select($"user_id", concat(
              lit("#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:"),
              (floor($"maxd").cast("long") + 1).cast("string"),
              lit("\n#EXT-X-PLAYLIST-TYPE:EVENT\n#EXT-X-MEDIA-SEQUENCE:"),
              greatest(lit(0L), $"maxidx" - (N - 1)).cast("string"),
              lit("\n"),
              array_join(transform($"segs", x =>
                format_string("#EXTINF:%.3f,\nuser-%d/chunks/%d.ts\n",
                  x("d"), $"user_id", x("i"))), "")
            ).as("manifest"))
          .orderBy($"user_id")
      },
      Some(s"""WITH lastn AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events)
        SELECT user_id,
          '#EXTM3U' || e'\\n' || '#EXT-X-VERSION:3' || e'\\n' ||
          '#EXT-X-TARGETDURATION:' || CAST(CAST(floor(max(value)) AS BIGINT) + 1 AS VARCHAR) || e'\\n' ||
          '#EXT-X-PLAYLIST-TYPE:EVENT' || e'\\n' ||
          '#EXT-X-MEDIA-SEQUENCE:' || CAST(greatest(0, max(event_id) - ${N - 1}) AS VARCHAR) || e'\\n' ||
          string_agg(printf('#EXTINF:%.3f,', value) || e'\\n' ||
                     printf('user-%d/chunks/%d.ts', user_id, event_id) || e'\\n',
                     '' ORDER BY event_id) AS manifest
        FROM lastn WHERE rn <= $N GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q56
    // A6 latency histogram, batch form: cumulative bucket counts over the
    // reference's Prometheus buckets (graft.streaming.Metrics.LatencyBuckets,
    // spark_streaming.py:95). Latency is derived deterministically from
    // event_id so every bucket including +Inf is exercised. Single scan,
    // conditional aggregation — one partial-agg shuffle of one row.
    QueryDef("q56_latency_histogram",
      (s, dir) => {
        import s.implicits._
        val latS = pmod($"event_id", lit(2000L)) / lit(100.0)
        val buckets = graft.streaming.Metrics.LatencyBuckets
        val cols =
          buckets.map(b => count_if(latS <= b).as(bucketCol(b))) ++
            Seq(count(lit(1)).as("le_inf"),
                sum(floor(latS * 1000.0)).cast("long").as("sum_ms"))
        t(s, dir, "events").agg(cols.head, cols.tail: _*)
      },
      Some {
        val buckets = graft.streaming.Metrics.LatencyBuckets
        // Both literals CAST-pinned to DOUBLE: under DECIMAL division
        // semantics (a legal DuckDB reading of `x / 100.0`) the latency is
        // exact decimal and floor(0.29 * 1000) = 290, while Spark's double
        // path gives floor(289.999...) = 289 — a VALUE-level divergence the
        // current DuckDB only avoids by happening to use float division.
        val latSql = "(event_id % 2000) / CAST(100.0 AS DOUBLE)"
        s"""SELECT
          ${buckets.map(b => s"count(*) FILTER ($latSql <= $b) AS ${bucketCol(b)},").mkString(" ")}
          count(*) AS le_inf,
          CAST(sum(floor($latSql * CAST(1000.0 AS DOUBLE))) AS BIGINT) AS sum_ms
          FROM events"""
      }),

    // ---------------------------------------------------------------- q83
    // Point-in-time enrichment: each purchase picks up the user's most
    // recent error at-or-before it (backward as-of join) — the classic
    // quote-to-trade / feature-store lookup. Spark side is
    // AsOfJoin.asOf's union–carry-forward (ONE shuffle on user_id, no M×N
    // candidate expansion); the oracle is DuckDB's native ASOF JOIN, an
    // independent algorithm. Fixture has no (user_id, ts) duplicates at any
    // SF, so the tiebreak never decides the answer; it's passed anyway so
    // the semantics stay deterministic on any input.
    QueryDef("q83_asof_enrich",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", $"event_id", $"value")
        graft.operators.AsOfJoin.asOf(
            purchases, errors, Seq("user_id"), "ts", "ts",
            tiebreak = Some("event_id"))
          .select($"event_id", $"user_id", $"ts", $"value",
            $"r_event_id".as("err_event_id"), $"r_value".as("err_value"),
            (unix_micros($"ts") - unix_micros($"r_ts")).as("us_since_err"))
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase'),
              e AS (SELECT user_id, ts, event_id, value FROM events
                WHERE event_type = 'error')
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
          e.event_id AS err_event_id, e.value AS err_value,
          CAST(epoch_us(p.ts) - epoch_us(e.ts) AS BIGINT) AS us_since_err
        FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts
        ORDER BY p.event_id""")),

    // ---------------------------------------------------------------- q84
    // Forward as-of with a tolerance: does a purchase FOLLOW each error
    // within 6 hours (error -> recovery attribution)? Same single-shuffle
    // operator walked in the other direction; the tolerance nulls matches
    // beyond the horizon, and the rollup counts recoveries per user.
    QueryDef("q84_asof_recovery",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id", $"value")
        graft.operators.AsOfJoin.asOf(
            errors, purchases, Seq("user_id"), "ts", "ts",
            direction = "forward", toleranceMicros = Some(6L * 3600 * 1000000),
            tiebreak = Some("event_id"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_errors"),
            count($"r_event_id").as("n_recovered"),
            round(sum(coalesce($"r_value", lit(0.0)).cast("decimal(30,6)"))
              .cast("double"), 6).as("recovered_value"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'error'),
              p AS (SELECT user_id, ts, event_id, value FROM events
                WHERE event_type = 'purchase'),
              m AS (SELECT e.user_id, e.event_id,
                  CASE WHEN epoch_us(p.ts) - epoch_us(e.ts)
                         <= CAST(21600000000 AS BIGINT) THEN p.event_id END AS r_event_id,
                  CASE WHEN epoch_us(p.ts) - epoch_us(e.ts)
                         <= CAST(21600000000 AS BIGINT) THEN p.value END AS r_value
                FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts)
        SELECT user_id, count(*) AS n_errors,
          count(r_event_id) AS n_recovered,
          round(CAST(sum(CAST(COALESCE(r_value, CAST(0.0 AS DOUBLE))
            AS DECIMAL(30,6))) AS DOUBLE), 6) AS recovered_value
        FROM m GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q85
    // Z-order layout effectiveness, as an oracle-checkable stat: assign the
    // events to 64 simulated files two ways — clustered by the Morton code
    // of (user_id, floor(value)) vs arrival (event_id) order — and count how
    // many files a rectangle predicate (user_id 40..60, value 100..200) has
    // to touch under each. The Morton code is the same codegen'd bit
    // arithmetic Layout.mortonCode emits, mirrored verbatim in the oracle.
    // The ntile here only simulates file IDs for the deterministic compare;
    // the real write path (Layout.zorderWrite) range-partitions on sampled
    // boundaries — parallel, no global sort — and is exercised in LayoutSpec.
    // The file ids are assigned with Layout.exactNtile (r19): the former
    // ntile(64) OVER (ORDER BY ...) windows pulled the ENTIRE events table
    // through ONE task each ("No Partition Defined for Window operation"
    // x2 per run) — the one 100 TB scale-killer left in the catalog.
    // exactNtile range-partitions, ranks per partition, and turns rank
    // into the identical tile id by arithmetic; the two tilings run as
    // independent parallel branches whose one-row aggregates cross-join.
    QueryDef("q85_zorder_pruning",
      (s, dir) => {
        import s.implicits._
        val z = graft.operators.Layout.mortonCode(
          Seq(graft.operators.Layout.clampDim($"user_id", zBits),
            graft.operators.Layout.clampDim($"value", zBits)), zBits)
        val hit = $"user_id".between(40, 60) && $"value".between(100.0, 200.0)
        val ev = t(s, dir, "events")
        val byZ = graft.operators.Layout.exactNtile(
            ev.select($"event_id", $"user_id", $"value", z.as("z")),
            Seq($"z", $"event_id"), 64, "fz")
          .agg(count_if(hit).cast("long").as("n_match"),
            count_distinct(when(hit, $"fz")).as("files_zorder"))
        val bySeq = graft.operators.Layout.exactNtile(
            ev.select($"event_id", $"user_id", $"value"),
            Seq($"event_id"), 64, "fs")
          .agg(count_distinct(when(hit, $"fs")).as("files_seq"))
        byZ.crossJoin(bySeq)
      },
      Some(s"""WITH b AS (SELECT event_id, user_id, value, $mortonSql AS z
          FROM events),
        f AS (SELECT user_id, value,
            ntile(64) OVER (ORDER BY z, event_id) AS fz,
            ntile(64) OVER (ORDER BY event_id) AS fs
          FROM b),
        h AS (SELECT *, user_id BETWEEN 40 AND 60
            AND value BETWEEN CAST(100.0 AS DOUBLE) AND CAST(200.0 AS DOUBLE)
            AS hit FROM f)
        SELECT CAST(count(*) FILTER (hit) AS BIGINT) AS n_match,
          CAST(count(DISTINCT CASE WHEN hit THEN fz END) AS BIGINT) AS files_zorder,
          CAST(count(DISTINCT CASE WHEN hit THEN fs END) AS BIGINT) AS files_seq
        FROM h""")),

    // ---------------------------------------------------------------- q90
    // CDC fold: the append-only event log becomes an SCD2 dimension history
    // (one row per value interval per user, valid_from/valid_to/is_current/
    // version). Two key-partitioned window passes — one hash shuffle on
    // user_id, no self-join, no driver state; late-writer ties resolve by
    // event_id so the fold is deterministic on at-least-once logs.
    QueryDef("q90_scd2_history",
      (s, dir) => {
        import s.implicits._
        val log = t(s, dir, "events")
          .select($"user_id", $"ts", $"value", $"event_id")
        graft.operators.Scd2.fromLog(log, "user_id", "ts", "value", "event_id")
          .select($"user_id", $"version".cast("long").as("version"), $"value",
            $"valid_from", $"valid_to", $"is_current")
          .orderBy($"user_id", $"version")
      },
      Some("""WITH w AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
              ORDER BY event_id DESC) AS rn
          FROM events),
        d AS (SELECT user_id, ts, value FROM w WHERE rn = 1),
        c AS (SELECT user_id, ts, value,
            lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM d),
        ch AS (SELECT user_id, ts, value FROM c
          WHERE value IS DISTINCT FROM prev),
        scd AS (SELECT user_id, value,
            CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
              AS BIGINT) AS version,
            ts AS valid_from,
            lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
          FROM ch)
        SELECT user_id, version, value, valid_from, valid_to,
          valid_to IS NULL AS is_current
        FROM scd ORDER BY user_id, version""")),

    // ---------------------------------------------------------------- q93
    // Ordered conversion funnel: first view, first click strictly AFTER
    // that view, first purchase strictly after that click — the stage
    // chaining that a naive per-type min() gets wrong (a click before the
    // first view must not count). Three aggregations all keyed on user_id:
    // the shuffle partitioning is computed once and reused down the chain,
    // and each stage's frame shrinks (users surviving the funnel), so at
    // 100 TB this is one user-keyed exchange plus joins that only ever
    // move (user_id, one timestamp).
    QueryDef("q93_funnel_conversion",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events").select($"user_id", $"ts", $"event_type")
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("tv"))
        val c = ev.filter($"event_type" === "click").join(v, "user_id")
          .filter($"ts" > $"tv")
          .groupBy($"user_id").agg(min($"ts").as("tc"))
        val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
          .filter($"ts" > $"tc")
          .groupBy($"user_id").agg(min($"ts").as("tp"))
        val lat = v.join(p, "user_id")
          .agg(sum(unix_micros($"tp") - unix_micros($"tv")).as("sum_us"),
            count(lit(1)).as("n_lat"))
        ev.agg(count_distinct($"user_id").as("n_users"))
          .crossJoin(v.agg(count(lit(1)).as("n_view")))
          .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
          .crossJoin(lat)
          .select($"n_users", $"n_view", $"n_click_after_view",
            $"n_purchase_after_click",
            round($"n_click_after_view".cast("double") /
              $"n_view".cast("double"), 6).as("view_to_click"),
            round($"n_purchase_after_click".cast("double") /
              $"n_click_after_view".cast("double"), 6).as("click_to_purchase"),
            round($"sum_us".cast("double") / $"n_lat".cast("double") /
              lit(3600000000.0), 6).as("mean_hours_to_purchase"))
      },
      Some("""WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS tv
            FROM events WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS tc
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.tv
            GROUP BY 1),
          p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS tp
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.tc
            GROUP BY 1),
          lat AS (SELECT CAST(sum(epoch_us(tp) - epoch_us(tv)) AS BIGINT)
              AS sum_us, count(*) AS n_lat
            FROM v JOIN p USING (user_id)),
          m AS (SELECT
            (SELECT count(DISTINCT user_id) FROM events) AS n_users,
            (SELECT count(*) FROM v) AS n_view,
            (SELECT count(*) FROM c) AS n_click,
            (SELECT count(*) FROM p) AS n_purchase)
        SELECT CAST(n_users AS BIGINT) AS n_users,
          CAST(n_view AS BIGINT) AS n_view,
          CAST(n_click AS BIGINT) AS n_click_after_view,
          CAST(n_purchase AS BIGINT) AS n_purchase_after_click,
          round(CAST(n_click AS DOUBLE) / CAST(n_view AS DOUBLE), 6)
            AS view_to_click,
          round(CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE), 6)
            AS click_to_purchase,
          round(CAST(sum_us AS DOUBLE) / CAST(n_lat AS DOUBLE)
            / CAST(3600000000 AS DOUBLE), 6) AS mean_hours_to_purchase
        FROM m CROSS JOIN lat""")),

    // ---------------------------------------------------------------- q94
    // Cohort retention: users grouped by first-seen day, activity counted
    // per day offset, rate against the cohort's size. Two user-keyed
    // aggregations plus one join on the tiny (cohort, size) frame — the
    // offset matrix is bounded by days², never by event count, so the
    // output and the final join stay small at any scale.
    QueryDef("q94_cohort_retention",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select($"user_id", date_trunc("day", $"ts").as("day"))
        val first = ev.groupBy($"user_id").agg(min($"day").as("cohort"))
        val act = ev.distinct()
        val ret = act.join(first, "user_id")
          .groupBy($"cohort",
            datediff($"day", $"cohort").cast("long").as("day_offset"))
          .agg(count(lit(1)).as("n_active"))
        val size = first.groupBy($"cohort").agg(count(lit(1)).as("cohort_size"))
        ret.join(size, "cohort")
          .select($"cohort", $"day_offset", $"n_active", $"cohort_size",
            round($"n_active".cast("double") / $"cohort_size".cast("double"), 6)
              .as("retention"))
          .orderBy($"cohort", $"day_offset")
      },
      Some("""WITH ev AS (SELECT user_id,
            date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
          first AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1),
          act AS (SELECT DISTINCT user_id, day FROM ev),
          ret AS (SELECT cohort,
              CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
              count(*) AS n_active
            FROM act JOIN first USING (user_id) GROUP BY 1, 2),
          sz AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY 1)
        SELECT CAST(cohort AS TIMESTAMP) AS cohort, day_offset,
          CAST(n_active AS BIGINT) AS n_active,
          CAST(cohort_size AS BIGINT) AS cohort_size,
          round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
            AS retention
        FROM ret JOIN sz USING (cohort) ORDER BY cohort, day_offset""")),

    // --------------------------------------------------------------- q104
    // Point-in-time enrichment against the SCD2 dimension q90 builds: each
    // event joins the version whose [valid_from, valid_to) interval covers
    // its timestamp — the temporal-join correctness test every warehouse
    // gets wrong first (joining is_current instead). Per (user, version)
    // event counts out. Plan shape: ONE user_id equi-join carrying the
    // interval predicate as a join filter — no range explosion, and the
    // history side is versions (tiny) while events stream through.
    QueryDef("q104_pit_enrichment",
      (s, dir) => {
        import s.implicits._
        val log = t(s, dir, "events")
          .select($"user_id", $"ts", $"value", $"event_id")
        val hist = graft.operators.Scd2.fromLog(
          log, "user_id", "ts", "value", "event_id")
        val ev = t(s, dir, "events").select($"user_id".as("u"), $"ts".as("ets"))
        ev.join(hist, $"u" === $"user_id" && $"ets" >= $"valid_from" &&
            ($"valid_to".isNull || $"ets" < $"valid_to"))
          .groupBy($"user_id", $"version")
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"version".cast("long").as("version"),
            $"n_events")
          .orderBy($"user_id", $"version")
      },
      Some("""WITH w AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
              ORDER BY event_id DESC) AS rn
          FROM events),
        d AS (SELECT user_id, ts, value FROM w WHERE rn = 1),
        c AS (SELECT user_id, ts, value,
            lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM d),
        ch AS (SELECT user_id, ts, value FROM c
          WHERE value IS DISTINCT FROM prev),
        scd AS (SELECT user_id,
            CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
              AS BIGINT) AS version,
            ts AS valid_from,
            lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
          FROM ch)
        SELECT e.user_id, s.version, count(*) AS n_events
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        JOIN scd s ON e.user_id = s.user_id AND e.ts >= s.valid_from
          AND (s.valid_to IS NULL OR e.ts < s.valid_to)
        GROUP BY 1, 2 ORDER BY e.user_id, s.version""")),

    // --------------------------------------------------------------- q121
    // Event-rate anomaly detection: hourly counts per event type scored
    // against their OWN trailing 24 h via z-score — the alert rule behind
    // every ops dashboard's "traffic spike" panel (and the batch analogue
    // of the reference's Prometheus rate() alerts, A7). The trailing window
    // is a RANGE frame over epoch-hours, so missing hours genuinely shrink
    // the baseline instead of silently stretching it (a ROWS frame would
    // reach back days across a gap). Variance comes from integer-exact
    // window sums (Σx, Σx²) via the textbook identity, so both engines do
    // the same three IEEE double ops — no Welford-vs-naive drift. Plan:
    // one (type, hour) partial-aggregable groupBy, then window functions
    // partitioned by type — at 100 TB the windowed frame is hours x types,
    // ~9k rows/type/year, a single executor's work after the reduce.
    QueryDef("q121_rate_anomaly",
      (s, dir) => {
        import s.implicits._
        val hourly = t(s, dir, "events")
          .groupBy($"event_type",
            unix_seconds(date_trunc("hour", $"ts")).as("hour_epoch"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy($"event_type").orderBy($"hour_epoch")
          .rangeBetween(-86400, -3600)
        val scored = hourly
          .withColumn("n_tr", count(lit(1)).over(w))
          .withColumn("sum_tr", sum($"cnt").over(w))
          .withColumn("sumsq_tr", sum($"cnt" * $"cnt").over(w))
          .filter($"n_tr" >= 12) // half a day of baseline before judging
          .withColumn("mean_tr",
            $"sum_tr".cast("double") / $"n_tr")
          .withColumn("var_tr",
            ($"sumsq_tr".cast("double") -
              $"sum_tr".cast("double") * $"sum_tr" / $"n_tr") /
              ($"n_tr" - 1))
          .withColumn("z", when($"var_tr" > 0,
            round(($"cnt" - $"mean_tr") / sqrt($"var_tr"), 6)).otherwise(0.0))
        scored.select($"event_type", $"hour_epoch", $"cnt", $"n_tr",
            round($"mean_tr", 6).as("mean_tr"), $"z",
            (abs($"z") >= 3.0).as("is_anomaly"))
          .orderBy($"event_type", $"hour_epoch")
      },
      Some("""WITH h AS (SELECT event_type,
            CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
              AS hour_epoch,
            count(*) AS cnt
          FROM events GROUP BY 1, 2),
        w AS (SELECT event_type, hour_epoch, cnt,
            count(*) OVER tw AS n_tr,
            sum(cnt) OVER tw AS sum_tr,
            sum(cnt * cnt) OVER tw AS sumsq_tr
          FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hour_epoch
            RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING)),
        sc AS (SELECT event_type, hour_epoch, cnt, n_tr,
            CAST(sum_tr AS DOUBLE) / n_tr AS mean_tr,
            (CAST(sumsq_tr AS DOUBLE)
              - CAST(sum_tr AS DOUBLE) * sum_tr / n_tr) / (n_tr - 1) AS var_tr
          FROM w WHERE n_tr >= 12)
        SELECT event_type, hour_epoch, CAST(cnt AS BIGINT) AS cnt,
          CAST(n_tr AS BIGINT) AS n_tr, round(mean_tr, 6) AS mean_tr,
          CASE WHEN var_tr > 0
            THEN round((cnt - mean_tr) / sqrt(var_tr), 6) ELSE 0.0 END AS z,
          (abs(CASE WHEN var_tr > 0
            THEN round((cnt - mean_tr) / sqrt(var_tr), 6) ELSE 0.0 END)
            >= 3.0) AS is_anomaly
        FROM sc ORDER BY event_type, hour_epoch""")),

    // --------------------------------------------------------------- q122
    // Per-user event-transition matrix (first-order Markov counts): each
    // user's event sequence contributes its adjacent (from, to) pairs;
    // transition probability normalizes within the from-type. The
    // session-path fingerprint behind "what do users do after an error" —
    // and the input a Markov-chain simulator of synthetic traffic trains
    // on. ONE window pass (lead over the user's time-ordered events, ties
    // broken by event_id so the order is total), one partial-aggregable
    // (from, to) groupBy, and the per-from normalizer joins back from a
    // types-sized aggregate — nothing scales past the event count.
    QueryDef("q170_cusum_changepoints",
      (s, dir) => {
        import s.implicits._
        // CUSUM drift detection per event type over daily counts, in exact
        // integer micro-units. The recursive form S_t = max(0, S_{t-1} +
        // x_t - k) is not window-expressible, but its closed form IS:
        // S_t = P_t - min(0, min_{j<=t} P_j) with P = prefix-sum(x - k)
        // (the running minimum plays the role of every reset). k is the
        // type's mean daily count (floor micro-units), the no-drift
        // baseline; alarm when S exceeds 2k — i.e. two mean-days of
        // accumulated excess. Every quantity is a BIGINT, so Spark and
        // DuckDB agree bit-for-bit; at 100 TB the windowed frame is
        // days x types after one partial-aggregated count.
        val daily = t(s, dir, "events")
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(count(lit(1)).as("n"))
        val wPre = Window.partitionBy($"event_type").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("k_micro",
            expr("(1000000L * sum(n) OVER (PARTITION BY event_type)) DIV " +
              "count(n) OVER (PARTITION BY event_type)"))
          .withColumn("p_micro",
            sum($"n" * lit(1000000L) - $"k_micro").over(wPre))
          .withColumn("s_micro",
            $"p_micro" - least(lit(0L), min($"p_micro").over(wPre)))
          .select($"event_type", $"day", $"n", $"k_micro", $"s_micro",
            ($"s_micro" > lit(2L) * $"k_micro").as("alarm"))
          .orderBy($"event_type", $"day")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*) AS n FROM events GROUP BY 1, 2),
        base AS (SELECT event_type, day, n,
            (1000000 * sum(n) OVER (PARTITION BY event_type)) //
              count(n) OVER (PARTITION BY event_type) AS k_micro
          FROM daily),
        pre AS (SELECT event_type, day, n, k_micro,
            sum(n * 1000000 - k_micro) OVER (PARTITION BY event_type
              ORDER BY day ROWS UNBOUNDED PRECEDING) AS p_micro
          FROM base),
        cu AS (SELECT event_type, day, n, k_micro, p_micro,
            p_micro - least(CAST(0 AS BIGINT), min(p_micro)
              OVER (PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING)) AS s_micro
          FROM pre)
        SELECT event_type, day, CAST(n AS BIGINT) AS n,
          CAST(k_micro AS BIGINT) AS k_micro,
          CAST(s_micro AS BIGINT) AS s_micro,
          (s_micro > 2 * k_micro) AS alarm
        FROM cu ORDER BY event_type, day""")),

    QueryDef("q122_event_transitions",
      (s, dir) => {
        import s.implicits._
        // shared edge derivation: q138's PageRank ranks over this same graph
        val cnt = graft.operators.Graph.eventTransitionEdges(t(s, dir, "events"))
          .select($"src".as("from_type"), $"dst".as("to_type"), $"cnt")
        val tot = cnt.groupBy($"from_type").agg(sum($"cnt").as("from_total"))
        cnt.join(tot, "from_type")
          .select($"from_type", $"to_type", $"cnt",
            round($"cnt".cast("double") / $"from_total", 6).as("p"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH o AS (SELECT user_id, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS next_type
          FROM events),
        c AS (SELECT event_type AS from_type, next_type AS to_type,
            count(*) AS cnt
          FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT from_type, sum(cnt) AS from_total FROM c GROUP BY 1)
        SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
          round(CAST(cnt AS DOUBLE) / from_total, 6) AS p
        FROM c JOIN t USING (from_type) ORDER BY from_type, to_type""")),

    // --------------------------------------------------------------- q128
    // Hopping (sliding) window: 1 h windows advancing every 15 min — the
    // overlap form that smooths tumbling-window edge artifacts on rate
    // dashboards. Spark's window(ts, "1 hour", "15 minutes") assigns each
    // event to its 4 covering windows; the oracle derives the same
    // windows by exploding the 4 slide offsets per event. The fan-out is
    // the window/slide ratio (here 4x) applied MAP-SIDE before the
    // partial aggregation, so the shuffle carries (windows x types)
    // combined rows — the event count never crosses the wire. Completes
    // the window-type surface: tumbling q23, session q24/q50, hopping
    // here.
    QueryDef("q128_hopping_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(30,6)")).cast("decimal(38,6)")
              .cast("double").as("total_value"))
          .select(unix_seconds($"window.start").as("win_start"),
            $"event_type", $"n", $"total_value")
          .orderBy($"win_start", $"event_type")
      },
      Some("""WITH e AS (SELECT event_type, value,
            CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
              + 900 * CAST(floor((epoch(CAST(ts AS TIMESTAMP))
                - epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) / 900)
                AS BIGINT) AS slot
          FROM events),
        x AS (SELECT event_type, value, slot - 900 * o.off AS win_start
          FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS off) o)
        SELECT win_start, event_type, count(*) AS n,
          CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(38,6))
            AS DOUBLE) AS total_value
        FROM x GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // --------------------------------------------------------------- q129
    // Per-type linear trend (closed-form OLS of value over day index):
    // slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), the drift detector behind
    // "is this metric creeping" dashboards — q121 catches spikes, this
    // catches slopes. Engine-exact by construction: x is an integer day
    // index and y snaps to DECIMAL(30,6), so all five sufficient
    // statistics are EXACT decimal/integer sums (order-independent); the
    // slope/intercept then evaluate as one identical IEEE expression on
    // both engines. ONE partial-aggregable groupBy — the sufficient-
    // statistics shape is why OLS scales to any corpus (no second pass,
    // no residual join).
    QueryDef("q129_trend_lines",
      (s, dir) => {
        import s.implicits._
        val anchor = to_timestamp(lit("2024-01-01"))
        val d = t(s, dir, "events").select($"event_type",
          datediff(date_trunc("day", $"ts"), anchor).cast("long").as("x"),
          $"value".cast("decimal(30,6)").as("y"))
        val stats = d.groupBy($"event_type").agg(
          count(lit(1)).as("n"), sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
          sum($"y").as("sy"), sum($"x" * $"y").as("sxy"))
        val nD = $"n".cast("double")
        val slope = (nD * $"sxy".cast("double") -
          $"sx".cast("double") * $"sy".cast("double")) /
          (nD * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double"))
        stats.select($"event_type", $"n",
            round(slope, 6).as("slope"),
            round(($"sy".cast("double") - slope * $"sx".cast("double")) / nD, 6)
              .as("intercept"))
          .orderBy($"event_type")
      },
      Some("""WITH d AS (SELECT event_type,
            CAST(date_diff('day', TIMESTAMP '2024-01-01',
              date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS x,
            CAST(value AS DECIMAL(30,6)) AS y
          FROM events),
        s AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
            sum(x * x) AS sxx, sum(y) AS sy, sum(x * y) AS sxy
          FROM d GROUP BY 1),
        e AS (SELECT event_type, n,
            (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
            CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
          FROM s)
        SELECT event_type, CAST(n AS BIGINT) AS n, round(slope, 6) AS slope,
          round((syd - slope * sxd) / CAST(n AS DOUBLE), 6) AS intercept
        FROM e ORDER BY event_type""")))

  private val zBits = 10

  /** The exact bit arithmetic of Layout.mortonCode(user_id, floor(value)),
    * as DuckDB SQL: dimension d of n owns bit positions i*n+d. Clamp first
    * (floor + saturate into [0, 2^bits)), then interleave. */
  private def mortonSql: String = {
    def clamp(e: String) =
      s"greatest(0, least(CAST(floor($e) AS BIGINT), ${(1L << zBits) - 1}))"
    val dims = Seq(clamp("user_id"), clamp("value"))
    val terms = for {
      (e, d) <- dims.zipWithIndex
      i <- 0 until zBits
    } yield s"((($e >> $i) & 1) << ${i * dims.size + d})"
    terms.mkString("(", " | ", ")")
  }

  /** Column-safe bucket name: le_0_25 for the 0.25 s bucket. */
  private def bucketCol(b: Double): String =
    "le_" + (if (b == b.floor) b.toLong.toString else b.toString.replace('.', '_'))
}
