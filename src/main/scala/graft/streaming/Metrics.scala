package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener

/** The reference's 7-metric observability surface
  * (spark_job/spark_streaming.py:74-104; monitoring/prometheus.yml:36-77),
  * name-for-name:
  *
  *   spark_vod_chunks_processed_total, spark_live_chunks_processed_total,
  *   live_chunk_gaps_total (counts MISSING chunks, not gap events),
  *   chunk_checksum_failures_total{stream_type},
  *   chunk_processing_latency_seconds (histogram, reference buckets),
  *   spark_vod_variants_generated_total, spark_active_live_streams (gauge).
  *
  * Counters are incremented from sink delivery, matching the reference's
  * increment-during-processing semantics (a replayed batch re-increments —
  * the reference has the same property). The listener additionally captures
  * `observe()`d per-batch metrics (e.g. corrupt-row counts from decode) and
  * Spark-level progress rows.
  */
object Metrics {

  val LatencyBuckets: Seq[Double] = Seq(0.1, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0)

  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val activeStreams = ConcurrentHashMap.newKeySet[String]()
  // histogram: per stream_type -> (bucket cumulative counts, sum-ms, count)
  private val histoCounts = new ConcurrentHashMap[String, Array[LongAdder]]()
  private val histoSumMs = new ConcurrentHashMap[String, LongAdder]()

  private def adder(name: String): LongAdder =
    counters.computeIfAbsent(name, _ => new LongAdder)

  def inc(name: String, n: Long = 1L): Unit = adder(name).add(n)
  def counter(name: String): Long = Option(counters.get(name)).map(_.sum).getOrElse(0L)
  def activeLiveStreams: Int = activeStreams.size

  def observeLatency(streamType: String, latencyMs: Double): Unit = {
    val bs = histoCounts.computeIfAbsent(streamType,
      _ => Array.fill(LatencyBuckets.size + 1)(new LongAdder))
    val sec = latencyMs / 1000.0
    var i = 0
    while (i < LatencyBuckets.size && sec > LatencyBuckets(i)) i += 1
    bs(i).increment() // per-bucket count; cumulative view via latencyHistogram
    histoSumMs.computeIfAbsent(streamType, _ => new LongAdder).add(latencyMs.toLong)
  }

  /** Cumulative histogram (le=bucket -> count), Prometheus-style. */
  def latencyHistogram(streamType: String): Seq[(Double, Long)] = {
    val bs = Option(histoCounts.get(streamType))
      .getOrElse(Array.fill(LatencyBuckets.size + 1)(new LongAdder))
    val raw = bs.map(_.sum)
    LatencyBuckets.zipWithIndex.map { case (b, i) => b -> raw.take(i + 1).sum } :+
      (Double.PositiveInfinity -> raw.sum)
  }

  def markLiveChunk(streamId: String, eventTs: Timestamp, gapSize: Long,
      checksumOk: Boolean): Unit = {
    inc("spark_live_chunks_processed_total")
    if (gapSize > 0) inc("live_chunk_gaps_total", gapSize)
    if (!checksumOk) inc("chunk_checksum_failures_total{stream_type=live}")
    observeLatency("live", (System.currentTimeMillis() - eventTs.getTime).toDouble)
    activeStreams.add(streamId)
  }

  def markVodChunk(checksumOk: Boolean): Unit = {
    inc("spark_vod_chunks_processed_total")
    inc("spark_vod_variants_generated_total", Processors.QualityVariants.size.toLong)
    if (!checksumOk) inc("chunk_checksum_failures_total{stream_type=vod}")
  }

  def reset(): Unit = {
    counters.clear(); activeStreams.clear(); histoCounts.clear(); histoSumMs.clear()
  }

  def snapshot: Map[String, Long] =
    counters.asScala.map { case (k, v) => k -> v.sum }.toMap +
      ("spark_active_live_streams" -> activeStreams.size.toLong)

  /** Captures `observe()`d metrics (corrupt-row counts etc.) into the
    * registry: an observed column named `m` on observation `o` lands under
    * counter name `o.m`. */
  final class ProgressListener extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      om.keySet().asScala.foreach { obsName =>
        val row = om.get(obsName)
        row.schema.fieldNames.foreach { f =>
          row.getAs[Any](f) match {
            case n: java.lang.Number => inc(s"$obsName.$f", n.longValue())
            case _ => ()
          }
        }
      }
    }
  }
}
