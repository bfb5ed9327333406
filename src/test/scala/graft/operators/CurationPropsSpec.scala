package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

/** Independent-reimplementation oracle for the curation operators: random
  * (seeded) corpora are run through the Spark operators and through plain
  * Scala recomputations of the same definitions; results must match
  * EXACTLY. This is the in-suite analogue of the DuckDB gate — a second,
  * dependency-free implementation of each operator's contract, over inputs
  * the fixtures don't cover (empty docs, single tokens, heavy repetition,
  * unseen categories). */
class CurationPropsSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "x1", "y2")

  /** Deterministic random corpus: ~1/8 empty docs, ~1/8 single-token,
    * lengths 0..24, tokens drawn from a 10-word vocab (dense repetition). */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      val len = rnd.nextInt(8) match {
        case 0 => 0
        case 1 => 1
        case _ => 2 + rnd.nextInt(23)
      }
      i -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  private def toks(text: String): Seq[String] =
    text.trim.split("\\s+").toSeq // mirrors TextFunctions.tokens (incl. "" -> Seq(""))

  private def grams(text: String, n: Int): Seq[String] =
    toks(text).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("repetitionStats == local recomputation on random corpora") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val data = corpus(seed, 120)
      val got = CorpusStats.repetitionStats(data.toDF("doc_id", "text"), n = 2)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct_grams"),
            r.getAs[Long]("top_gram_count"),
            r.getAs[Double]("dup_gram_frac"), r.getAs[Double]("top_gram_frac"))))
        .toMap
      assert(got.size === data.size, "one row per input doc")
      data.foreach { case (id, text) =>
        val g = grams(text, 2)
        val counts = g.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val (total, distinct) = (g.size.toLong, counts.size.toLong)
        val top = if (counts.isEmpty) 0L else counts.values.max
        def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val expect = (total, distinct, top,
          if (total > 0) r6(1.0 - distinct.toDouble / total) else 0.0,
          if (total > 0) r6(top.toDouble / total) else 0.0)
        assert(got(id) === expect, s"doc $id (seed $seed): '$text'")
      }
    }
  }

  test("topNgrams == local top-k with (count desc, gram asc) tie-break") {
    for (seed <- Seq(7L, 8L)) {
      val data = corpus(seed, 150)
      val k = 12
      val got = CorpusStats.topNgrams(data.toDF("doc_id", "text"), n = 2, k = k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val all = data.flatMap { case (_, t) => grams(t, 2) }
      val expect = all.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case (g, c) => (g, c) }
        .sortBy { case (g, c) => (-c, g) }
        .take(k)
      assert(got === expect, s"seed $seed")
    }
  }

  test("tfidfTopTerms == local recomputation (smoothed idf, rounded)") {
    for (seed <- Seq(11L, 12L)) {
      val data = corpus(seed, 60)
      val k = 3
      val got = CorpusStats.tfidfTopTerms(data.toDF("doc_id", "text"), k = k)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
          ((r.getAs[Long]("tf"), r.getAs[Double]("tfidf"))))
        .toMap
      // mirror the operator's empty-token filter: blank docs contribute no
      // terms (and '' never inflates df)
      val tf = data.flatMap { case (id, t) => toks(t).filter(_.nonEmpty).map(id -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nDocs = data.size.toLong
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val scored = tf.map { case ((id, term), f) =>
        (id, term) -> ((f, r6(f * (math.log((nDocs + 1.0) / (df(term) + 1.0)) + 1.0))))
      }
      val expect = scored.groupBy(_._1._1).flatMap { case (_, terms) =>
        terms.toSeq.sortBy { case ((_, term), (_, s)) => (-s, term) }.take(k)
      }
      assert(got === expect, s"seed $seed")
    }
  }

  test("Decontamination.overlap == local distinct-gram set intersection") {
    for (seed <- Seq(21L, 22L)) {
      val data = corpus(seed, 100)
      val (ev, tr) = data.partition(_._1 % 11 == 0)
      val got = Decontamination.overlap(
          tr.toDF("doc_id", "text"), ev.toDF("doc_id", "text"), n = 2)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared"))
        .toMap
      val evalGrams = ev.flatMap { case (_, t) => grams(t, 2) }.toSet
      val expect = tr.map { case (id, t) =>
        id -> grams(t, 2).toSet.count(evalGrams.contains).toLong
      }.filter(_._2 > 0).toMap
      assert(got === expect, s"seed $seed")
    }
  }

  test("sharedFingerprintPairs invariants on random corpora") {
    for (seed <- Seq(41L, 42L)) {
      val data = corpus(seed, 80)
      val df = data.toDF("doc_id", "text")
      val loose = Dedup.sharedFingerprintPairs(df, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // pairs are strictly ordered and counts honor the filter
      loose.foreach { case ((a, b), n) =>
        assert(a < b, s"pair ($a,$b) not ordered")
        assert(n >= 1L)
      }
      // minShared=2 is exactly the >=2 subset of minShared=1 (same counts)
      val strict = Dedup.sharedFingerprintPairs(df, minShared = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(strict === loose.filter(_._2 >= 2L), s"seed $seed")
      // a capped run can only lose pairs / shrink counts, never invent them
      val capped = Dedup.sharedFingerprintPairs(df, minShared = 1, maxBucket = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      capped.foreach { case (pair, n) =>
        assert(loose.contains(pair), s"capped invented pair $pair (seed $seed)")
        assert(n <= loose(pair), s"capped inflated count for $pair (seed $seed)")
      }
    }
  }

  test("weightedSample / capPerCategory / mixtureRates == local md5 + formula recomputation") {
    val data = corpus(31L, 400).map { case (id, t) =>
      (id, t, vocab((id % 4).toInt)) // 4 categories, 100 docs each
    }
    val df = data.toDF("doc_id", "text", "cat")

    // weightedSample membership: hash(salt, id) < threshold(rate)
    val rates = Map(vocab(0) -> 0.3, vocab(1) -> 1.0, vocab(2) -> 0.0)
    val kept = Sampling.weightedSample(df, "cat", rates, defaultRate = 0.6)
      .collect().map(_.getLong(0)).toSet
    val expectKept = data.filter { case (id, _, cat) =>
      val rate = rates.getOrElse(cat, 0.6)
      val thr = Sampling.rateThresholdHex(rate)
      md5hex(s"graft-mix$id").substring(0, 8) < thr
    }.map(_._1).toSet
    assert(kept === expectKept)

    // capPerCategory: the k smallest (hash, id) per category
    val capped = Sampling.capPerCategory(df, "cat", k = 7, salt = "graft-cap")
      .collect().map(_.getLong(0)).toSet
    val expectCapped = data.groupBy(_._3).values.flatMap { rows =>
      rows.map { case (id, _, _) => (md5hex(s"graft-cap$id").substring(0, 8), id) }
        .sorted.take(7).map(_._2)
    }.toSet
    assert(capped === expectCapped)

    // mixtureRates: K = min n_c/share_c; rate = K*share/n rounded
    val shares = Map(vocab(0) -> 0.5, vocab(1) -> 0.25, vocab(3) -> 0.25)
    val gotRates = Sampling.mixtureRates(df, "cat", shares)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val counts = data.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val kTotal = shares.collect { case (c, s) if s > 0 => counts(c) / s }.min
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    counts.keys.foreach { c =>
      val expect = shares.get(c).filter(_ > 0)
        .map(s => r6(math.min(1.0, kTotal * s / counts(c)))).getOrElse(0.0)
      assert(gotRates(c) === expect, s"category $c")
    }
  }

  test("unigramNll == local recomputation (decimal-exact contribution sum)") {
    for (seed <- Seq(51L, 52L)) {
      val data = corpus(seed, 80)
      val got = CorpusStats.unigramNll(data.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("nll"))))
        .toMap
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val tokens = data.map { case (id, t) => id -> toks(t).filter(_.nonEmpty) }
      val ct = tokens.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = ct.values.sum.toDouble
      val expect = tokens.map { case (id, ts) =>
        if (ts.isEmpty) id -> ((0L, 0.0))
        else {
          // mirror the operator: per-TERM rounded ln(p) as exact decimal,
          // weighted by the doc's term count, exact sum, final double mean
          val sum = ts.groupBy(identity).map { case (term, occ) =>
            BigDecimal(r6(math.log(ct(term) / total))) * occ.size
          }.sum
          id -> ((ts.size.toLong, r6(-sum.toDouble / ts.size)))
        }
      }.toMap
      assert(got === expect, s"seed $seed")
      assert(got.size === data.size, "one row per doc, empties included")
    }
  }

  test("bigramNll == local recomputation (stupid backoff, decimal-exact)") {
    for (seed <- Seq(71L, 72L)) {
      val data = corpus(seed, 80)
      val model = data.filter(_._1 % 3 != 0) // held-out: 1/3 of docs unseen
      val got = CorpusStats.bigramNll(
          data.toDF("doc_id", "text"), model.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll"))))
        .toMap
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val mTok = model.map { case (_, t) => toks(t).filter(_.nonEmpty) }
      val c1 = mTok.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = c1.values.sum.toDouble
      val cb = mTok.flatMap(_.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = data.map { case (id, t) =>
        val ts = toks(t).filter(_.nonEmpty)
        val bgs = ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
        if (bgs.isEmpty) id -> ((0L, 0.0))
        else {
          val sum = bgs.groupBy(identity).map { case (bg, occ) =>
            val p = cb.get(bg).map(c => c.toDouble / c1(bg._1))
              .orElse(c1.get(bg._2).map(c => 0.4 * c / total))
              .getOrElse(0.4 / total)
            BigDecimal(r6(math.log(p))) * occ.size
          }.sum
          id -> ((bgs.size.toLong, r6(-sum.toDouble / bgs.size)))
        }
      }.toMap
      assert(got === expect, s"seed $seed")
      assert(got.size === data.size, "one row per doc, bigram-less included")
    }
  }

  test("categoryDrift == local recomputation (smoothed log-odds)") {
    val data = corpus(61L, 200)
    val oldDocs = data.filter(_._1 % 5 != 0).map { case (id, t) => (id, t, vocab((id % 3).toInt)) }
    // category vocab(3) exists ONLY in the new snapshot: smoothing must keep it finite
    val newDocs = data.filter(_._1 % 7 != 0).map { case (id, t) => (id, t, vocab(((id % 3) + (if (id % 13 == 0) 3 else 0)).toInt min 3)) }
    val got = CorpusStats.categoryDrift(
        oldDocs.toDF("doc_id", "text", "src"), newDocs.toDF("doc_id", "text", "src"), "src")
      .collect()
      .map(r => r.getAs[String]("category") ->
        ((r.getAs[Long]("n_old"), r.getAs[Long]("n_new"),
          r.getAs[Double]("share_old"), r.getAs[Double]("share_new"),
          r.getAs[Double]("log_odds_drift"))))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val no = oldDocs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nn = newDocs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cats = (no.keySet ++ nn.keySet)
    val (tOld, tNew, k) = (no.values.sum, nn.values.sum, cats.size.toLong)
    cats.foreach { c =>
      val (o, n) = (no.getOrElse(c, 0L), nn.getOrElse(c, 0L))
      val expect = (o, n,
        r6(o.toDouble / tOld), r6(n.toDouble / tNew),
        r6(math.log(((n + 1).toDouble / (tNew + k)) / ((o + 1).toDouble / (tOld + k)))))
      assert(got(c) === expect, s"category $c")
    }
    assert(got.keySet === cats)
  }

  test("containmentPairs == local brute force on random corpora (prefix filter loses nothing)") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val data = corpus(seed, 80)
      val got = Dedup.containmentPairs(data.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getAs[Long]("id_small"), r.getAs[Long]("id_large")) ->
          r.getAs[Long]("overlap")).toMap
      val sets = data.map { case (id, t) => id -> grams(t, 3).distinct.toSet }.toMap
      val expected = (for {
        (ia, sa) <- sets.toSeq; (ib, sb) <- sets.toSeq
        if sa.size >= 5 && (sa.size < sb.size || (sa.size == sb.size && ia < ib))
        ov = (sa & sb).size
        if ov * 5 >= sa.size * 4
      } yield (ia, ib) -> ov.toLong).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("dupSpanCoverage == local recomputation on random corpora") {
    for (seed <- Seq(21L, 22L)) {
      val data = corpus(seed, 100)
      val got = CorpusStats.dupSpanCoverage(data.toDF("doc_id", "text"), n = 4)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))))
        .toMap
      val spans = data.map { case (id, t) => id -> grams(t, 4) }.toMap
      val gramDocs = spans.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, v) => g -> v.size }
      data.foreach { case (id, _) =>
        val gs = spans(id)
        val dup = gs.count(g => gramDocs(g) >= 2)
        assert(got(id) === ((gs.size.toLong, dup.toLong)), s"doc $id seed $seed")
      }
    }
  }

  test("exactStratifiedSample == local hash-order quota selection on random strata") {
    val rnd = new scala.util.Random(31L)
    val rows = (0L until 200L).map(i => (i, s"s${rnd.nextInt(7)}"))
    for ((num, den) <- Seq((1, 3), (2, 5), (1, 7))) {
      val got = Sampling.exactStratifiedSample(
          rows.toDF("doc_id", "source"), num, den, "source")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val expected = rows.groupBy(_._2).flatMap { case (_, members) =>
        val quota = (members.size * num + den - 1) / den
        members.map(_._1)
          .sortBy(id => (md5hex("graft-strat" + id).take(8), id))
          .take(quota)
      }.toSet
      assert(got === expected, s"rate $num/$den")
    }
  }

  test("bucketedIntervalJoin == theta join on random intervals across bucket widths") {
    val rnd = new scala.util.Random(41L)
    val base = 1700000000L
    val ivs = (1L to 40L).map { i =>
      val s = base + rnd.nextInt(200000)
      (i, new java.sql.Timestamp(s * 1000L),
        new java.sql.Timestamp((s + rnd.nextInt(20000) - 2000) * 1000L)) // some reversed
    }
    val pts = (1L to 300L).map { j =>
      (j, 1L + rnd.nextInt(40),
        new java.sql.Timestamp((base + rnd.nextInt(220000)) * 1000L))
    }
    val ivDf = ivs.toDF("iv_id", "start_ts", "end_ts")
    val ptDf = pts.toDF("p_id", "key", "ts")
    val expected = (for {
      (ii, s, e) <- ivs; (pj, k, ts) <- pts
      if k == ii && !ts.before(s) && !ts.after(e)
    } yield (ii, pj)).sorted
    for (w <- Seq(60L, 3600L, 86400L)) {
      val got = IntervalJoin.bucketedIntervalJoin(ivDf, ptDf,
          "start_ts", "end_ts", "ts", Seq("iv_id" -> "key"), bucketSeconds = w)
        .select("iv_id", "p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === expected, s"bucket $w")
    }
  }
}
