package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ManifestFunctions._

/** Golden tests pinning the reference manifest format byte-for-byte
  * (spark_job/spark_streaming.py:427-449, :184-189; README.md:536-545). */
class ManifestFunctionsSpec extends AnyFunSuite {

  test("segment line matches reference #EXTINF format (3dp, trailing newline)") {
    assert(segmentLine(2.5, "s1/chunks/7.ts") == "#EXTINF:2.500,\ns1/chunks/7.ts\n")
    assert(segmentLine(3.0, "a/b/0.ts") == "#EXTINF:3.000,\na/b/0.ts\n")
  }

  test("live manifest golden: window not yet full") {
    val segs = (0L to 2L).map(i => Segment(2.0 + i, chunkUri("live-x", i)))
    val m = buildLiveManifest(segs, latestChunkIndex = 2, windowSize = 10)
    assert(m ==
      """#EXTM3U
        |#EXT-X-VERSION:3
        |#EXT-X-TARGETDURATION:5
        |#EXT-X-PLAYLIST-TYPE:EVENT
        |#EXT-X-MEDIA-SEQUENCE:0
        |#EXTINF:2.000,
        |live-x/chunks/0.ts
        |#EXTINF:3.000,
        |live-x/chunks/1.ts
        |#EXTINF:4.000,
        |live-x/chunks/2.ts
        |""".stripMargin)
  }

  test("TARGETDURATION truncates (int(max)+1, not ceil)") {
    val m = buildLiveManifest(Seq(Segment(2.999, "u")), latestChunkIndex = 0)
    assert(m.contains("#EXT-X-TARGETDURATION:3\n")) // int(2.999)+1 = 3, NOT 4
    val m2 = buildLiveManifest(Seq(Segment(3.0, "u")), latestChunkIndex = 0)
    assert(m2.contains("#EXT-X-TARGETDURATION:4\n")) // int(3.0)+1 = 4
  }

  test("MEDIA-SEQUENCE = max(0, latestIndex - N + 1), from index not window contents") {
    val segs = (0 until 3).map(i => Segment(2.0, s"u$i")) // only 3 segments present
    val m = buildLiveManifest(segs, latestChunkIndex = 41, windowSize = 10)
    assert(m.contains("#EXT-X-MEDIA-SEQUENCE:32\n")) // 41-10+1, independent of contents
  }

  test("window slides to last N in arrival order") {
    val segs = (0L until 15L).map(i => Segment(2.0, chunkUri("s", i)))
    val m = buildLiveManifest(segs, latestChunkIndex = 14, windowSize = 10)
    assert(!m.contains("s/chunks/4.ts"))
    assert(m.contains("s/chunks/5.ts") && m.contains("s/chunks/14.ts"))
    assert(m.linesIterator.count(_.startsWith("#EXTINF:")) == 10)
  }

  test("ended stream appends ENDLIST") {
    val m = buildLiveManifest(Seq(Segment(2.0, "u")), 0, ended = true)
    assert(m.endsWith("#EXT-X-ENDLIST\n"))
  }

  test("parseSegments round-trips a built manifest") {
    val segs = (0L until 5L).map(i => Segment(2.0 + i * 0.25, chunkUri("rt", i)))
    val m = buildLiveManifest(segs, latestChunkIndex = 4)
    assert(parseSegments(m) == segs)
  }
}
