package graft.functions

import java.util.Locale

/** Pure HLS manifest construction, reproducing the reference's exact output
  * format (spark_job/spark_streaming.py:427-449 for live DVR manifests;
  * :288-293 for VOD). Pure functions so golden tests pin every quirk:
  *
  *  - TARGETDURATION is `int(max(durations)) + 1` (truncation, not ceil)
  *  - the PLAYLIST-TYPE:EVENT line sits between TARGETDURATION and
  *    MEDIA-SEQUENCE
  *  - MEDIA-SEQUENCE is `max(0, latestIndex - windowSize + 1)` — computed
  *    from the latest chunk index, NOT from window contents
  *  - segments are emitted in arrival order, each as `#EXTINF:{d:.3f},\n{uri}\n`
  *  - an ended stream appends `#EXT-X-ENDLIST`
  */
object ManifestFunctions {

  final case class Segment(durationSeconds: Double, uri: String)

  val DefaultDvrWindowSize = 10 // .env.example:75

  /** One HLS segment entry (spark_streaming.py:184-189). Locale-pinned so
    * the decimal separator never depends on the JVM default. */
  def segmentLine(durationSeconds: Double, uri: String): String =
    String.format(Locale.ROOT, "#EXTINF:%.3f,\n%s\n", Double.box(durationSeconds), uri)

  def chunkUri(streamId: String, chunkIndex: Long): String =
    s"$streamId/chunks/$chunkIndex.ts"

  /** Slide the DVR window: keep the last N segments in arrival order
    * (spark_streaming.py:431-432). */
  def slideWindow(segments: Seq[Segment], windowSize: Int): Seq[Segment] =
    if (segments.length > windowSize) segments.takeRight(windowSize) else segments

  /** Build the live DVR manifest for the current window.
    * `latestChunkIndex` drives MEDIA-SEQUENCE per the reference formula. */
  def buildLiveManifest(
      segments: Seq[Segment],
      latestChunkIndex: Long,
      windowSize: Int = DefaultDvrWindowSize,
      ended: Boolean = false): String = {
    val window = slideWindow(segments, windowSize)
    val target = window.map(_.durationSeconds).foldLeft(0.0)(math.max).toLong + 1
    val mediaSeq = math.max(0L, latestChunkIndex - windowSize + 1)
    val sb = new StringBuilder
    sb ++= "#EXTM3U\n"
    sb ++= "#EXT-X-VERSION:3\n"
    sb ++= s"#EXT-X-TARGETDURATION:$target\n"
    sb ++= "#EXT-X-PLAYLIST-TYPE:EVENT\n"
    sb ++= s"#EXT-X-MEDIA-SEQUENCE:$mediaSeq\n"
    window.foreach(s => sb ++= segmentLine(s.durationSeconds, s.uri))
    if (ended) sb ++= "#EXT-X-ENDLIST\n"
    sb.toString
  }

  /** Parse EXTINF/URI pairs back out of a manifest (spark_streaming.py:
    * 405-425) — used when recovering window state from a stored manifest. */
  def parseSegments(manifest: String): Seq[Segment] = {
    val lines = manifest.split("\n", -1)
    val out = Seq.newBuilder[Segment]
    var i = 0
    while (i < lines.length) {
      if (lines(i).startsWith("#EXTINF:")) {
        val dur = lines(i).stripPrefix("#EXTINF:").stripSuffix(",")
        if (i + 1 < lines.length) out += Segment(dur.toDouble, lines(i + 1))
        i += 2
      } else i += 1
    }
    out.result()
  }
}
