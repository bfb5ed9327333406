package graft.operators

import graft.SparkSpec

/** Exact pins for the repetition-profile and top-k n-gram operators on
  * hand-computable fixtures, plus the tie-break/row-count contracts. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // 2-grams: "a b","b a","a b","b a" -> 4 total, 2 distinct, top 2
    (1L, "a b a b a"),
    // all distinct: "x y","y z" -> 2 total, 2 distinct, top 1
    (2L, "x y z"),
    // pure repetition: "r r" x4 -> 4 total, 1 distinct, top 4
    (3L, "r r r r r"),
    // below n tokens: no grams at all
    (4L, "solo"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("repetitionStats: exact counts and fractions, zero-gram docs survive") {
    val got = CorpusStats.repetitionStats(docs, n = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct_grams"),
          r.getAs[Long]("top_gram_count"),
          r.getAs[Double]("dup_gram_frac"), r.getAs[Double]("top_gram_frac"))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L), "every input doc must appear")
    assert(got(1L) === ((4L, 2L, 2L, 0.5, 0.5)))
    assert(got(2L) === ((2L, 2L, 1L, 0.0, 0.5)))
    assert(got(3L) === ((4L, 1L, 4L, 0.75, 1.0)))
    assert(got(4L) === ((0L, 0L, 0L, 0.0, 0.0)))
    assert(got(5L) === ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("topNgrams: frequency ranking with total (count desc, gram asc) order") {
    val corpus = Seq(
      "p q r p q r",   // "p q r" x2, "q r p" x1, "r p q" x1
      "p q r",         // "p q r" x1
      "a b c"          // "a b c" x1
    ).toDF("text")
    val got = CorpusStats.topNgrams(corpus, n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "p q r" x3 leads; the three count-1 grams tie and resolve
    // alphabetically, k=3 truncating AFTER the total order
    assert(got === Seq(("p q r", 3L), ("a b c", 1L), ("q r p", 1L)))
  }

  test("topNgrams plan: partial aggregation + TakeOrdered, no global sort") {
    val plan = CorpusStats.topNgrams(docs, n = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must use TakeOrderedAndProject, not Sort+Limit:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"gram counts must partially aggregate map-side:\n$plan")
  }
}
