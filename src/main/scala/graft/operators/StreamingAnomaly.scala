package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming event-rate anomaly detection — the stateful counterpart of
  * the batch q121 query: hourly counts per event type scored by z-score
  * against their OWN trailing window, emitted continuously as hours
  * finalize instead of recomputed over the history.
  *
  * Topology: watermarked 1-hour tumbling count (append mode, so each hour
  * arrives exactly once, when the watermark passes its end) feeding a
  * `transformWithState` processor keyed by event type whose state is the
  * trailing ring of (hour, count) pairs — O(horizon) entries per key, NOT
  * O(history), and the horizon prune runs on every input. Missing hours
  * genuinely shrink the baseline (the ring stores present hours only and
  * the scorer filters by epoch range), matching q121's RANGE-frame
  * semantics; the variance comes from the same integer-exact Σx/Σx² sums
  * and identical IEEE double steps, so a verdict here equals the batch
  * query's row for the same data — pinned by StreamingAnomalySpec.
  *
  * Scale: state is (event types × horizon hours) tiny rows; the hourly
  * pre-aggregation is the only corpus-sized stage and it partial-aggregates
  * map-side. This is the alerting shape the reference exposes through
  * Prometheus `rate()` panels (A7), upgraded from fixed thresholds to
  * self-calibrating per-key baselines.
  */
object StreamingAnomaly {

  final case class HourIn(event_type: String, hour_epoch: Long, cnt: Long)

  final case class HourCnt(hour_epoch: Long, cnt: Long)

  /** One scored hour; emitted only once its trailing baseline has at least
    * `minTrailing` present hours (q121's n_tr >= 12 gate). */
  final case class Verdict(
      event_type: String,
      hour_epoch: Long,
      cnt: Long,
      n_tr: Long,
      mean_tr: Double,
      z: Double,
      is_anomaly: Boolean)

  /** The exact q121 arithmetic for one hour against its trailing set:
    * textbook-identity variance from integer sums, z rounded to 6 dp,
    * |z| >= 3 flags. Shared by the processor and the parity spec. */
  private[operators] def score(
      cur: HourCnt, trailing: Seq[HourCnt]): (Long, Double, Double, Boolean) = {
    val n = trailing.size.toLong
    val sum = trailing.map(_.cnt).sum
    val sumsq = trailing.map(h => h.cnt * h.cnt).sum
    val mean = sum.toDouble / n
    val varTr = (sumsq.toDouble - sum.toDouble * sum / n) / (n - 1)
    val z =
      if (varTr > 0) math.rint((cur.cnt - mean) / math.sqrt(varTr) * 1e6) / 1e6
      else 0.0
    (n, math.rint(mean * 1e6) / 1e6, z, math.abs(z) >= 3.0)
  }

  final class Processor(minTrailing: Int, horizonHours: Int)
      extends StatefulProcessor[String, HourIn, Verdict] {

    @transient private var ring: ListState[HourCnt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getListState[HourCnt]("ring",
        Encoders.product[HourCnt], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[HourIn],
        timerValues: TimerValues): Iterator[Verdict] = {
      val horizonSec = horizonHours * 3600L
      // several hours can finalize in one micro-batch (a watermark jump);
      // process ascending so each scores against exactly the hours that
      // preceded it — batch parity requires this order
      val incoming = rows.toSeq.sortBy(_.hour_epoch)
      var state = ring.get().toSeq.sortBy(_.hour_epoch)
      val out = Seq.newBuilder[Verdict]
      incoming.foreach { r =>
        val lo = r.hour_epoch - horizonSec
        val hi = r.hour_epoch - 3600L
        val trailing = state.filter(h => h.hour_epoch >= lo && h.hour_epoch <= hi)
        if (trailing.size >= minTrailing) {
          val (n, mean, z, flag) = score(HourCnt(r.hour_epoch, r.cnt), trailing)
          out += Verdict(key, r.hour_epoch, r.cnt, n, mean, z, flag)
        }
        // horizon prune: nothing older than (newest - horizon) can enter a
        // future hour's trailing range, because finalized hours only move
        // forward under the watermark
        state = (state :+ HourCnt(r.hour_epoch, r.cnt))
          .filter(_.hour_epoch >= r.hour_epoch - horizonSec)
      }
      ring.put(state.toArray)
      out.result().iterator
    }
  }

  /** Full topology: watermarked hourly counts -> keyed trailing-ring
    * scoring. `events` needs `ts` (timestamp) and `event_type` columns.
    * Emits in append mode as hours finalize. */
  def hourlyVerdicts(
      events: DataFrame,
      watermark: String = "2 hours",
      minTrailing: Int = 12,
      horizonHours: Int = 24): Dataset[Verdict] = {
    val hourly = events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        unix_seconds(col("window.start")).as("hour_epoch"), col("cnt"))
      .as[HourIn](Encoders.product[HourIn])
    hourly.groupByKey(_.event_type)(Encoders.STRING)
      .transformWithState(new Processor(minTrailing, horizonHours),
        TimeMode.None(), OutputMode.Append())(Encoders.product[Verdict])
  }
}
