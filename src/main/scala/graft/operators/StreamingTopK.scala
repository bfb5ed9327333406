package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Continuous per-group heavy hitters with BOUNDED state: the SpaceSaving
  * summary (Metwally et al. 2005) inside a `transformWithState` processor —
  * the streaming counterpart of the batch Count-Min heavy-hitter query
  * (q87). An exact streaming groupBy-count needs state proportional to the
  * distinct-item cardinality (unbounded on raw text/URLs); SpaceSaving
  * holds exactly `capacity` counters per group and still guarantees:
  *
  *   - every item with true count > N/capacity is IN the summary,
  *   - est − err ≤ true ≤ est for every tracked item,
  *   - err ≤ N/capacity (N = total weight seen by the group).
  *
  * Scale shape: rows shuffle once, keyed by group, and the processor
  * combines each micro-batch to per-item weights in memory before folding
  * into the summary — so the SpaceSaving fold runs once per distinct item
  * per batch, not per event. (A watermarked upstream pre-aggregation would
  * add map-side combine but forces event-time semantics; Spark disallows an
  * unwatermarked streaming groupBy under append mode.) State is `capacity`
  * rows per group key regardless of history length.
  *
  * Emission: after each batch that touches a group, the group's current
  * top-`k` snapshot (rank by estimate desc, then item) tagged with a
  * monotone `snap` number — downstream keeps MAX(snap) per group for the
  * live leaderboard. When `capacity` is never exceeded the estimates are
  * EXACT batch counts with err 0 (pinned against a batch groupBy by the
  * spec, alongside the eviction-error guarantees on an overflowing key).
  */
object StreamingTopK {

  final case class ItemIn(group: String, item: String, w: Long)

  final case class Counter(item: String, cnt: Long, err: Long)

  final case class Summary(snap: Long, n_total: Long, counters: Array[Counter])

  final case class TopKRow(
      group: String,
      snap: Long,
      rank: Int,
      item: String,
      cnt: Long,
      err: Long,
      n_total: Long)

  /** One SpaceSaving update pass: fold `incoming` weighted items into the
    * counter set at `capacity`. Deterministic eviction: the minimum
    * (cnt, item) counter is replaced — the item tiebreak makes replays and
    * engines agree on WHICH counter leaves, not just how many. Shared by
    * the processor and the spec's reference fold. */
  private[operators] def fold(
      counters: Seq[Counter],
      incoming: Seq[(String, Long)],
      capacity: Int): Seq[Counter] =
    incoming.foldLeft(counters) { case (cs, (item, w)) =>
      cs.indexWhere(_.item == item) match {
        case i if i >= 0 =>
          cs.updated(i, cs(i).copy(cnt = cs(i).cnt + w))
        case _ if cs.size < capacity =>
          cs :+ Counter(item, w, 0L)
        case _ =>
          val evict = cs.minBy(c => (c.cnt, c.item))
          cs.filterNot(_ eq evict) :+ Counter(item, evict.cnt + w, evict.cnt)
      }
    }

  final class Processor(capacity: Int, k: Int)
      extends StatefulProcessor[String, ItemIn, TopKRow] {

    @transient private var state: ValueState[Summary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Summary]("spacesaving",
        Encoders.product[Summary], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[ItemIn],
        timerValues: TimerValues): Iterator[TopKRow] = {
      // Combine the batch per item, then fold in ascending (item) order:
      // one fold per distinct item, replay-deterministic even though the
      // batch delivers rows in shuffle order.
      val incoming = rows.foldLeft(Map.empty[String, Long]) { (m, r) =>
        m.updated(r.item, m.getOrElse(r.item, 0L) + r.w)
      }.toSeq.sortBy(_._1)
      val prev = Option(state.get()).getOrElse(Summary(0L, 0L, Array.empty))
      val counters = fold(prev.counters.toSeq, incoming, capacity)
      val snap = prev.snap + 1
      val total = prev.n_total + incoming.map(_._2).sum
      state.update(Summary(snap, total, counters.toArray))
      counters.sortBy(c => (-c.cnt, c.item)).take(k).zipWithIndex.map {
        case (c, i) => TopKRow(key, snap, i + 1, c.item, c.cnt, c.err, total)
      }.iterator
    }
  }

  /** Full topology: one shuffle keyed by group into the SpaceSaving
    * processor (which batch-combines per item internally). `items` needs
    * (group, item) columns and an optional weight (defaults to 1 per
    * row). */
  def topK(
      items: DataFrame,
      capacity: Int = 64,
      k: Int = 10,
      groupCol: String = "group",
      itemCol: String = "item",
      weightCol: Option[String] = None): Dataset[TopKRow] = {
    require(capacity >= k, s"capacity $capacity must be >= k $k")
    // Malformed weights are ignored, not fatal: a NULL weight would kill
    // the whole query at Dataset decode (non-nullable Long), and a
    // negative one would silently break every SpaceSaving invariant
    // (est >= true, err <= N/capacity) — a frequency sketch has no
    // semantics for either.
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val weighted = items.select(col(groupCol).as("group"), col(itemCol).as("item"),
        w.as("w"))
      .filter(col("w").isNotNull && col("w") > 0L)
      .as[ItemIn](Encoders.product[ItemIn])
    weighted.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new Processor(capacity, k),
        TimeMode.None(), OutputMode.Append())(Encoders.product[TopKRow])
  }
}
