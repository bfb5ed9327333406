package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.ManifestFunctions.{Segment, buildLiveManifest, parseSegments, slideWindow}

/** Property-based pinning of the manifest/window/gap semantics promised in
  * SURVEY.md §5.2: for arbitrary event sequences the DVR window never
  * exceeds N, MEDIA-SEQUENCE follows the reference formula, manifests
  * roundtrip through the parser, and gap totals equal the number of
  * skipped sequence numbers. */
object ManifestProps extends Properties("manifest") {

  // durations on the 3-dp grid the EXTINF format preserves; uris newline-free
  private val segGen: Gen[Segment] = for {
    ms <- Gen.choose(1L, 20000L)
    id <- Gen.choose(0L, 99999L)
  } yield Segment(ms / 1000.0, s"s/$id.ts")

  private val segsGen = Gen.nonEmptyListOf(segGen)
  private val winGen = Gen.choose(1, 20)

  property("window never exceeds N and keeps the newest suffix in order") =
    forAll(segsGen, winGen) { (segs, n) =>
      val w = slideWindow(segs, n)
      w.length <= n && w == segs.takeRight(math.min(n, segs.length))
    }

  property("MEDIA-SEQUENCE = max(0, latestIdx - N + 1); TARGETDURATION = floor(max)+1") =
    forAll(segsGen, winGen, Gen.choose(0L, 10000L)) { (segs, n, latest) =>
      val m = buildLiveManifest(segs, latest, n)
      val w = slideWindow(segs, n)
      val mediaSeq = m.linesIterator
        .find(_.startsWith("#EXT-X-MEDIA-SEQUENCE:")).get.split(":")(1).toLong
      val target = m.linesIterator
        .find(_.startsWith("#EXT-X-TARGETDURATION:")).get.split(":")(1).toLong
      mediaSeq == math.max(0L, latest - n + 1) &&
        target == w.map(_.durationSeconds).max.toLong + 1
    }

  property("manifest roundtrips through the parser (window contents exact)") =
    forAll(segsGen, winGen) { (segs, n) =>
      parseSegments(buildLiveManifest(segs, latestChunkIndex = 42L, windowSize = n)) ==
        slideWindow(segs, n)
    }

  property("ENDLIST appears iff the stream ended, always terminal") =
    forAll(segsGen) { segs =>
      val live = buildLiveManifest(segs, 0L)
      val ended = buildLiveManifest(segs, 0L, ended = true)
      !live.contains("#EXT-X-ENDLIST") && ended.endsWith("#EXT-X-ENDLIST\n")
    }

  /** The reference gap fold (spark_streaming.py:378-385) as the pure spec:
    * gap fires only on forward jumps, state update unconditional. */
  private def gapFold(seqs: Seq[Long]): Long = {
    var last = Option.empty[Long]
    var missing = 0L
    seqs.foreach { s =>
      last.foreach(l => if (s > l + 1) missing += s - l - 1)
      last = Some(s)
    }
    missing
  }

  property("for ascending sequences, missing total = count of skipped numbers") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 500L))) { raw =>
      val present = raw.distinct.sorted
      val expectedMissing = (present.max - present.min + 1) - present.length
      gapFold(present) == expectedMissing
    }

  property("a late (smaller) seq never fires a gap but resets the baseline") =
    forAll(Gen.choose(5L, 100L), Gen.choose(1L, 4L)) { (high, low) =>
      // [high, low]: no gap on low (backward); then high again fires
      // against the RESET baseline low, not against high.
      gapFold(Seq(high, low, high)) == high - low - 1
    }
}
