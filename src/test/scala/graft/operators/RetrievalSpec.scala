package graft.operators

import graft.SparkSpec

/** BM25 pinned against a hand-computed reference implementation on a tiny
  * corpus, plus the ranking/tie-break and posting-bound contracts. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "x x y"),
    (2L, "x z"),
    (3L, "y z z"),
    (4L, "")
  ).toDF("doc_id", "text")

  /** Reference scorer: the exact formula from Retrieval.bm25TopK. */
  private def bm25(tf: Long, df: Long, dl: Long, nDocs: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (nDocs.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
    val raw = idf * (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bm25TopK: scores match the closed-form reference on a hand corpus") {
    // Corpus: N=4 (the empty doc counts toward N), dl: 3,2,3; sum=8,
    // avgdl = 8/4 = 2. df: x->2, y->2, z->2.
    val got = Retrieval.bm25TopK(docs, nQueryTerms = 3, topK = 10)
      .collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("tf"), r.getAs[Double]("score"))))
      .toMap
    val avgdl = 8.0 / 4.0
    // term x: doc1 tf=2 dl=3, doc2 tf=1 dl=2
    assert(got(("x", 1L))._3 === bm25(2, 2, 3, 4, avgdl))
    assert(got(("x", 2L))._3 === bm25(1, 2, 2, 4, avgdl))
    // term z: doc3 tf=2 dl=3, doc2 tf=1 dl=2
    assert(got(("z", 3L))._3 === bm25(2, 2, 3, 4, avgdl))
    assert(got(("z", 2L))._3 === bm25(1, 2, 2, 4, avgdl))
    // Ranking: higher tf at equal df/dl wins; rank is 1-based per term.
    assert(got(("x", 1L))._1 === 1L && got(("x", 2L))._1 === 2L)
    assert(got(("z", 3L))._1 === 1L && got(("z", 2L))._1 === 2L)
  }

  test("bm25TopK: equal-score ties order by doc_id and topK bounds each posting list") {
    // Five docs identical in (tf, dl) for term t -> identical scores; the
    // rank order must be doc_id, and topK=3 truncates the list.
    val tied = (1L to 5L).map(i => (i, "t u")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(tied, nQueryTerms = 2, topK = 3)
      .filter($"term" === "t").collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Double]("score")).distinct.length === 1)
  }

  test("bm25TopK: query terms are the nQueryTerms highest-df terms, ties by term text") {
    // df: a->3, b->2, c->2, d->1; nQueryTerms=3 -> {a, b, c} (c beats d on
    // df; b before c irrelevant to membership but pins the tie rule).
    val corpus = Seq((1L, "a b c"), (2L, "a b"), (3L, "a c d"))
      .toDF("doc_id", "text")
    val terms = Retrieval.bm25TopK(corpus, nQueryTerms = 3, topK = 5)
      .select("term").distinct().as[String].collect().toSet
    assert(terms === Set("a", "b", "c"))
  }
}
