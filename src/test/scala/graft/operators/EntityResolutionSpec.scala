package graft.operators

import graft.SparkSpec

/** Segment-blocked fuzzy matching: pigeonhole completeness for
  * substitution noise, the refinement threshold, and the blocking
  * contract's documented limits. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val base = "abcdefgh" * 5 // exactly keyLen=40, 5 aligned segments

  private def mutate(s: String, at: Int*): String =
    at.foldLeft(s)((acc, i) => acc.updated(i, 'Z'))

  test("pairs within maxEdit substitutions are found when a segment survives") {
    val docs = Seq(
      (1L, base),
      (2L, mutate(base, 0, 9)),        // 2 subs in segments 1,2 -> ed 2
      (3L, mutate(base, 0, 9, 17, 25)) // 4 subs in segments 1-4 -> seg 5 shared
    ).toDF("doc_id", "text")
    val got = EntityResolution.segmentBlockedFuzzyPairs(docs)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("edit_dist")).toMap
    assert(got((1L, 2L)) === 2L)
    assert(got((1L, 3L)) === 4L)
    assert(got((2L, 3L)) === 2L) // differ at 17,25 only
  }

  test("candidates sharing a segment but beyond maxEdit are refined away") {
    // Segment 1 identical; the other 4 segments fully rewritten -> ed >> 4.
    val docs = Seq(
      (1L, base),
      (2L, base.take(8) + "QRSTUVWX" * 4)
    ).toDF("doc_id", "text")
    assert(EntityResolution.segmentBlockedFuzzyPairs(docs).count() === 0L)
  }

  test("pigeonhole bound: one substitution in every segment evades blocking (ed=5 > maxEdit anyway)") {
    val docs = Seq(
      (1L, base),
      (2L, mutate(base, 0, 8, 16, 24, 32))
    ).toDF("doc_id", "text")
    assert(EntityResolution.segmentBlockedFuzzyPairs(docs).count() === 0L)
  }

  test("short texts pad to fixed width: identical short heads pair at ed 0") {
    val docs = Seq((7L, "short title"), (9L, "short title tail beyond the key is ignored aaaaaa"))
      .toDF("doc_id", "text")
    val got = EntityResolution.segmentBlockedFuzzyPairs(docs, keyLen = 10, segments = 5, maxEdit = 2)
      .collect()
    assert(got.length === 1 &&
      got.head.getAs[Long]("id_a") === 7L && got.head.getAs[Long]("edit_dist") === 0L)
  }

  test("each unordered pair appears once even when several segments match") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text") // all 5 segments match
    val rows = EntityResolution.segmentBlockedFuzzyPairs(docs).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("edit_dist") === 0L)
  }
}
