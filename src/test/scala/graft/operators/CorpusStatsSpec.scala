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

  test("tfidfTopTerms: exact smoothed scores, per-doc total order, k honored") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple")
    ).toDF("doc_id", "text")
    val got = CorpusStats.tfidfTopTerms(corpus, k = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Double]("tfidf"))))
      .toMap
    // N=3; df: apple 2, banana 2, cherry 1
    // idf(df=2) = ln(4/3)+1 = 1.287682...; idf(df=1) = ln(2)+1 = 1.693147...
    assert(got(1L) === (("apple", 2L, 2.575364)), "tf=2 dominates doc 1")
    assert(got(2L) === (("cherry", 1L, 1.693147)), "rarer term outranks equal-tf banana")
    assert(got(3L) === (("apple", 1L, 1.287682)))
    // k=2 adds the runner-ups in (score desc, term asc) order
    val k2 = CorpusStats.tfidfTopTerms(corpus, k = 2)
      .orderBy($"doc_id", $"tfidf".desc)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(k2.toSeq === Seq((1L, "apple"), (1L, "banana"),
      (2L, "cherry"), (2L, "banana"), (3L, "apple")))
  }

  test("snapshotDiff: exact statuses; formatting-only edits are unchanged") {
    val oldV = Seq(
      (1L, "stays the same"),
      (2L, "will be edited"),
      (3L, "will be removed"),
      (4L, "Formatting, only!")
    ).toDF("doc_id", "text")
    val newV = Seq(
      (1L, "stays the same"),
      (2L, "will be edited for real"),
      (4L, "formatting only"), // same normalized content
      (5L, "brand new doc")
    ).toDF("doc_id", "text")
    val got = CorpusStats.snapshotDiff(oldV, newV)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("pmiCollocations: exact PMI, min-count pruning, tie order") {
    // doc1 pairs: (a,b) (b,a) (a,b); doc2 pairs: (a,b) (b,c)
    // unigrams: a=3 b=3 c=1 (U=7); pair total B=5
    // cab: (a,b)=3 (b,a)=1 (b,c)=1
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = graft.operators.CorpusStats.pmiCollocations(d, minCount = 1, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      BigDecimal(math.log((cab.toDouble / 5) /
          ((ca.toDouble / 7) * (cb.toDouble / 7))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq === Seq(("a", "b"), ("b", "c"), ("b", "a")),
      "PMI desc; the (a,b)/(b,c) score TIE breaks by w1")
    assert(got.toMap === Map(
      ("a", "b") -> ((3L, 3L, 3L, pmi(3, 3, 3))),
      ("b", "a") -> ((1L, 3L, 3L, pmi(1, 3, 3))),
      ("b", "c") -> ((1L, 3L, 1L, pmi(1, 3, 1)))))
    // min-count pruning: only the 3-occurrence pair survives
    val pruned = graft.operators.CorpusStats.pmiCollocations(d, minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pruned.toSeq === Seq(("a", "b")))
  }

  test("bigramNll: seen / backoff / OOV-floor branches all score correctly") {
    import spark.implicits._
    // model unigrams: a:2 b:2 c:1 d:1, T = 6; model bigrams: (a,b):2 (b,c):1 (b,d):1
    val model = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val scoreMe = Seq(
      (10L, "a b"),   // seen bigram: p = cb(a,b)/c1(a) = 2/2 = 1 -> ln 0
      (11L, "d a"),   // unseen bigram, known w2: p = 0.4*c1(a)/T = 0.8/6
      (12L, "a zzz"), // unseen bigram, OOV w2: p = 0.4/T
      (13L, "solo"),  // one token: no bigrams
      (14L, "")       // no tokens
    ).toDF("doc_id", "text")
    val got = CorpusStats.bigramNll(scoreMe, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(10L) === ((1L, 0.0)))
    assert(got(11L) === ((1L, -math.rint(math.log(0.4 * 2 / 6.0) * 1e6) / 1e6)))
    assert(got(12L) === ((1L, -math.rint(math.log(0.4 / 6.0) * 1e6) / 1e6)))
    assert(got(13L) === ((0L, 0.0)))
    assert(got(14L) === ((0L, 0.0)))
    // ordering sanity: OOV floor is the most surprising, seen the least
    assert(got(12L)._2 > got(11L)._2 && got(11L)._2 > got(10L)._2)
  }

  test("perplexityBands: banding, counts, and DECIMAL-exact per-band means") {
    import spark.implicits._
    val model = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b", "s1"),   // nll 0.0                      -> head
      (11L, "d a", "s1"),   // nll -ln(0.8/6)  ~ 2.014903   -> middle
      (12L, "a zzz", "s2"), // nll -ln(0.4/6)  ~ 2.70805    -> tail
      (13L, "a b", "s2")    // nll 0.0                      -> head
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.perplexityBands(score, model,
        headMax = 1.0, middleMax = 2.5)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("band")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_bigrams"),
          r.getAs[Double]("mean_nll"))))
      .toMap
    val mid = -math.rint(math.log(0.4 * 2 / 6.0) * 1e6) / 1e6
    val tail = -math.rint(math.log(0.4 / 6.0) * 1e6) / 1e6
    assert(got.keySet === Set(("s1", "head"), ("s1", "middle"),
      ("s2", "head"), ("s2", "tail")))
    assert(got(("s1", "head")) === ((1L, 1L, 0.0)))
    assert(got(("s1", "middle")) === ((1L, 1L, mid)))
    assert(got(("s2", "tail")) === ((1L, 1L, tail)))
    assert(got(("s2", "head")) === ((1L, 1L, 0.0)))
    intercept[IllegalArgumentException] {
      CorpusStats.perplexityBands(score, model, headMax = 3.0, middleMax = 2.0)
    }
  }

  test("bpeTrain reproduces the textbook Sennrich merges on the classic vocab") {
    import spark.implicits._
    // Sennrich et al. 2016's worked example: {low:5, lower:2, newest:6,
    // widest:3}. Hand-computed pair counts: (e,s)=9 and (s,t)=9 tie in
    // round 1 — the deterministic tie-break (pair text ascending) picks
    // "e s"; round 2 merges (es,t)=9; round 3 has (l,o)=(o,w)=7 — text
    // order picks "l o".
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(docs, merges = 3)
    assert(merges === Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
  }

  test("bpeMergeSymbols merges left-to-right non-overlapping (aaa -> [aa, a])") {
    import spark.implicits._
    val got = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("c", "a", "b")),
        Tuple1(Seq("a", "b", "b")), Tuple1(Seq.empty[String]))
      .toDF("symbols")
      .select(CorpusStats.bpeMergeSymbols(
        org.apache.spark.sql.functions.col("symbols"), "a", "a").as("m"))
      .collect().map(_.getAs[collection.Seq[String]]("m").toSeq)
    assert(got(0) === Seq("aa", "a"))
    assert(got(1) === Seq("c", "a", "b"))
    assert(got(2) === Seq("a", "b", "b"))
    assert(got(3) === Seq.empty)
  }

  test("bpeTrain stops early when no pair reaches minPairCount") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text") // every pair count 1
    assert(CorpusStats.bpeTrain(docs, merges = 5).isEmpty)
  }

  test("topNgrams plan: partial aggregation + TakeOrdered, no global sort") {
    val plan = CorpusStats.topNgrams(docs, n = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must use TakeOrderedAndProject, not Sort+Limit:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"gram counts must partially aggregate map-side:\n$plan")
  }

  test("dupSpanCoverage: cross-document spans flagged, within-doc repeats are not") {
    val corpus = Seq(
      // docs 1,2 share the 8-gram "a b c d e f g h"; each has one extra span
      (1L, "a b c d e f g h x"),
      (2L, "z a b c d e f g h"),
      // repeats ITS OWN span twice but shares nothing cross-doc
      (3L, "q w e r t y u i q w e r t y u i"),
      // too short for any 8-gram
      (4L, "tiny doc"),
      // 8 distinct tokens: exactly one span, unshared
      (5L, "m n o p s t v w")
    ).toDF("doc_id", "text")
    val got = CorpusStats.dupSpanCoverage(corpus, n = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_span_frac"))))
      .toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    // doc 3: 9 spans; the self-repeated gram occurs in ONE doc only -> 0 dup
    assert(got(3L) === ((9L, 0L, 0.0)))
    assert(got(4L) === ((0L, 0L, 0.0)))
    assert(got(5L) === ((1L, 0L, 0.0)))
  }

  test("dupSpanCoverage: a doc's repeated occurrences of a cross-dup span all count") {
    val corpus = Seq(
      (1L, "a b c d e f g h a b c d e f g h"), // gram "a..h" occurs at pos 1 and 9
      (2L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val got = CorpusStats.dupSpanCoverage(corpus, n = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))))
      .toMap
    // doc1: 9 spans, the two exact "a..h" occurrences are cross-dup
    assert(got(1L)._1 === 9L && got(1L)._2 >= 2L)
    assert(got(2L) === ((1L, 1L)))
  }

  test("bpeEncode applies merges in priority order; unseen words fall back to chars") {
    import spark.implicits._
    // Train on the Sennrich corpus (merges: (e,s), (es,t), (l,o)); encode a
    // vocab containing training words AND an unseen word.
    val train = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(train, merges = 3).map { case (a, b, _) => (a, b) }
    val apply = Seq((1L, "newest lowest zap")).toDF("doc_id", "text")
    val got = CorpusStats.bpeEncode(CorpusStats.bpeVocab(apply), merges)
      .collect().map(r => r.getAs[String]("word") ->
        r.getAs[collection.Seq[String]]("symbols").toSeq).toMap
    // newest: e+s -> es, es+t -> est
    assert(got("newest") === Seq("n", "e", "w", "est"))
    // lowest: l+o -> lo, est forms too
    assert(got("lowest") === Seq("lo", "w", "est"))
    // no learned pair applies to zap
    assert(got("zap") === Seq("z", "a", "p"))
    // every encoding reconstructs its word
    got.foreach { case (w, syms) => assert(syms.mkString("") === w) }
  }
}
