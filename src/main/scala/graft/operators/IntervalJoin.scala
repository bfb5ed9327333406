package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join (points-in-ranges) decomposed into an
  * equi-join — the range-join shape Spark's planner would otherwise execute
  * as a broadcast-nested-loop (every point against every interval).
  *
  * Technique: quantize time into fixed buckets. Each interval explodes to
  * one row per bucket it overlaps; each point maps to exactly ONE bucket;
  * the join keys on (equi keys, bucket) and re-checks exact containment.
  * `start ≤ ts ≤ end` implies `bucket(start) ≤ bucket(ts) ≤ bucket(end)`,
  * so no match is lost, and because an interval's exploded buckets are
  * distinct and a point has one bucket, no pair is emitted twice — no
  * dedup pass. This is the standard bucketized range-join rewrite (Spark
  * itself and warehouse engines apply it when a range-join hint + bounds
  * are provided); spelling it as an operator keeps the plan hash-join-only
  * at any scale.
  *
  * Sizing: shuffle volume multiplies intervals by `span/bucketSeconds`, so
  * pick the bucket near the TYPICAL interval span — a day-long session at
  * 1 h buckets is a 24× fan-out of the (small) interval side, against a
  * single hash join on (keys, bucket) for the (large) point side. Skewed
  * single buckets (flash events) fall back to AQE skew-join splitting.
  */
object IntervalJoin {

  // per-JVM sequence for the default observe name: Spark rejects two
  // CollectMetrics nodes with the same name in one plan
  private val observeSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Join `points` into `intervals` where `equiKeys` match and
    * `tsCol ∈ [startCol, endCol]` (inclusive both ends). Returns all
    * interval columns plus all point columns except its join duplicates.
    * Degenerate intervals with `end < start` match nothing and are dropped
    * up front.
    *
    * `equiKeys` maps interval-side column → point-side column; the bucket
    * key rides alongside them in one hash join.
    *
    * Wide-interval policy (r10 advice: never a SILENT loss): intervals
    * spanning ≥ `maxBucketsPerInterval` buckets are corrupt by declaration.
    * `strict = false` (default) drops them but publishes the dropped count
    * as an observed metric `<name>.dropped_wide_intervals` — read it from
    * `result.queryExecution.observedMetrics` after any action (match the
    * key by the `interval_join` prefix, or pass `metricName` to fix it), or
    * from any Query(Execution)Listener, so a caller with legitimately wide
    * intervals SEES the loss. The default name carries a per-JVM sequence
    * suffix because Spark requires observe names to be UNIQUE within one
    * query plan — a fixed default would make any composition of two
    * interval joins fail analysis. `strict = true` fails the job instead,
    * from inside the plan (distributed `raise_error`, no extra driver
    * job), naming the offending span.
    */
  def bucketedIntervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      equiKeys: Seq[(String, String)] = Nil,
      bucketSeconds: Long = 3600L,
      maxBucketsPerInterval: Long = 100000L,
      strict: Boolean = false,
      metricName: String = ""): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // Output-name safety: a silent duplicate column poisons every
    // downstream by-name reference, so reject collisions up front.
    val ptKept = points.columns.filterNot((equiKeys.map(_._2).toSet + tsCol))
    val clashes = intervals.columns.toSet
      .intersect(ptKept.toSet + "point_ts") ++
      (intervals.columns ++ points.columns).filter(c => c == "_bucket" || c == "_span_buckets")
    require(clashes.isEmpty,
      s"column name collision in interval-join output: ${clashes.mkString(", ")} — " +
        "rename before joining ('_bucket', '_span_buckets' and 'point_ts' are reserved)")
    val spanned = intervals
      .filter(col(endCol) >= col(startCol))
      // Span cap: ONE corrupt wide interval (wrong unit, sentinel date)
      // would otherwise ask sequence() for millions of elements and abort
      // the whole job. Same bounded-blowup contract as LSH's maxBucket.
      // Production sets the cap at the honest maximum span it expects.
      .withColumn("_span_buckets",
        expr(s"CAST($endCol AS LONG) div $bucketSeconds") -
          expr(s"CAST($startCol AS LONG) div $bucketSeconds"))
    val guarded =
      if (strict)
        spanned.filter(
          when(col("_span_buckets") < maxBucketsPerInterval, lit(true))
            .otherwise(raise_error(concat(
              lit(s"interval spans "), col("_span_buckets"),
              lit(s" buckets >= maxBucketsPerInterval=$maxBucketsPerInterval" +
                s" (bucketSeconds=$bucketSeconds); widen the cap or fix the data")))))
      else {
        val mName = if (metricName.nonEmpty) metricName
          else s"interval_join_${observeSeq.incrementAndGet()}"
        spanned
          .observe(mName, count_if(col("_span_buckets") >= maxBucketsPerInterval)
            .as("dropped_wide_intervals"))
          .filter(col("_span_buckets") < maxBucketsPerInterval)
      }
    val iv = guarded
      .drop("_span_buckets")
      .withColumn("_bucket", explode(sequence(
        expr(s"CAST($startCol AS LONG) div $bucketSeconds"),
        expr(s"CAST($endCol AS LONG) div $bucketSeconds"))))
      .alias("iv")
    val pt = points
      .withColumn("_bucket", expr(s"CAST($tsCol AS LONG) div $bucketSeconds"))
      .alias("pt")
    val joinCond = equiKeys
      .map { case (a, b) => col(s"iv.$a") === col(s"pt.$b") }
      .foldLeft(col("iv._bucket") === col("pt._bucket"))(_ && _) &&
      col(s"pt.$tsCol") >= col(s"iv.$startCol") &&
      col(s"pt.$tsCol") <= col(s"iv.$endCol")
    val outCols =
      intervals.columns.map(c => col(s"iv.$c")) ++
      ptKept.map(c => col(s"pt.$c")) :+
      col(s"pt.$tsCol").as("point_ts")
    iv.join(pt, joinCond).select(outCols.toIndexedSeq: _*)
  }
}
