package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.functions.ManifestFunctions
import graft.functions.ManifestFunctions.Segment

/** Typed Aggregator building an HLS DVR manifest from chunk rows — the
  * "manifest_agg" batch-rebuild surface promised in SURVEY.md §7.3.
  *
  * Scale property: the buffer is BOUNDED at the window size N. The
  * declarative q27 form collects every group row (`collect_list`) before
  * slicing; this aggregator keeps only the N newest segments per partial
  * aggregate, so map-side combine ships at most N segments per group per
  * partition regardless of stream length — the right shape for unbounded
  * chunk histories.
  *
  * Semantics identical to q27 / spark_streaming.py:427-449: window = last
  * N by chunk index (ascending in the manifest), MEDIA-SEQUENCE =
  * max(0, maxIdx - N + 1), TARGETDURATION = floor(max window duration)+1.
  */
object ManifestAggregator {

  final case class Seg(idx: Long, dur: Double, uri: String)
  final case class Buf(segs: Seq[Seg]) // ascending by idx, length <= n

  final class ManifestAgg(n: Int) extends Aggregator[Seg, Buf, String] {
    override def zero: Buf = Buf(Vector.empty)

    private def insert(segs: Seq[Seg], s: Seg): Seq[Seg] = {
      val (lo, hi) = segs.span(_.idx < s.idx)
      val merged = (lo :+ s) ++ hi
      if (merged.length > n) merged.takeRight(n) else merged
    }

    override def reduce(b: Buf, a: Seg): Buf = Buf(insert(b.segs, a))

    override def merge(b1: Buf, b2: Buf): Buf = {
      val merged = (b1.segs ++ b2.segs).sortBy(_.idx)
      Buf(if (merged.length > n) merged.takeRight(n) else merged)
    }

    override def finish(b: Buf): String =
      ManifestFunctions.buildLiveManifest(
        b.segs.map(s => Segment(s.dur, s.uri)),
        latestChunkIndex = if (b.segs.isEmpty) 0L else b.segs.last.idx,
        windowSize = n)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Untyped UDAF handle: `manifestAgg(N)(col(idx), col(dur), col(uri))`. */
  def manifestAgg(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new ManifestAgg(n), Encoders.product[Seg])
}
