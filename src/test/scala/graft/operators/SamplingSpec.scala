package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/splitting/packing: every assignment is a pure
  * function of (id, salt), so the pins here are exact, not statistical. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("doc_id")

  test("deterministicSplit: stable across runs/orderings, fraction approximately honored") {
    val d = ids(2000)
    val s1 = Sampling.deterministicSplit(d, valFraction = 0.1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical on a re-run and on reversed input order
    val s2 = Sampling.deterministicSplit(d.orderBy($"doc_id".desc), valFraction = 0.1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2)
    val valCount = s1.values.count(_ == "val")
    // md5 is uniform: 2000 draws at p=0.1 -> ~200 +- 5 sigma (~67)
    assert(valCount > 130 && valCount < 270, s"val fraction off: $valCount/2000")
    // a different salt gives a DIFFERENT (independent) split
    val s3 = Sampling.deterministicSplit(d, valFraction = 0.1, salt = "fold-2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s3 !== s1)
    // threshold hex is the documented external-SQL contract
    assert(Sampling.fractionThresholdHex(0.1) === "19999999")
    assert(Sampling.fractionThresholdHex(0.0) === "00000000")
    assert(Sampling.fractionThresholdHex(1.0) === "ffffffff")
  }

  test("stratifiedSample keeps the same ids regardless of stratum labels") {
    val d = ids(1000).withColumn("lang", when($"doc_id" % 3 === 0, "en").otherwise("de"))
    val kept = Sampling.stratifiedSample(d, fraction = 0.2)
      .collect().map(_.getLong(0)).toSet
    // relabeling strata does not change membership (hash is id-only)
    val relabeled = Sampling.stratifiedSample(
      d.withColumn("lang", lit("zz")), fraction = 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(kept === relabeled)
    // sample of a sample at a higher threshold is a superset
    val keptMore = Sampling.stratifiedSample(d, fraction = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(keptMore), "thresholded hash samples must nest")
  }

  test("weightedSample: per-category rates, id-only coin flip, exact keep-all") {
    val d = ids(3000).withColumn("lang",
      when($"doc_id" % 3 === 0, "en")
        .when($"doc_id" % 3 === 1, "zh").otherwise("de"))
    val rates = Map("en" -> 0.2, "zh" -> 1.0)
    val kept = Sampling.weightedSample(d, "lang", rates, defaultRate = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // rate 1.0 keeps EVERY row of the category (sentinel, not clamped hex)
    assert(kept.values.count(_ == "zh") === 1000)
    assert(Sampling.rateThresholdHex(1.0) === "g")
    assert(Sampling.rateThresholdHex(0.5) === "80000000")
    // approximate rates for the thresholded categories (~5 sigma bands)
    val en = kept.values.count(_ == "en")
    val de = kept.values.count(_ == "de")
    assert(en > 140 && en < 260, s"en rate off: $en/1000 at 0.2")
    assert(de > 420 && de < 580, s"de rate off: $de/1000 at 0.5")

    // the coin flip ignores the category: a doc kept at rate r stays kept
    // when its category is renamed to another rate-r category
    val renamed = Sampling.weightedSample(
      d.withColumn("lang", when($"lang" === "en", "xx").otherwise($"lang")),
      "lang", Map("xx" -> 0.2, "zh" -> 1.0), defaultRate = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(renamed === kept.keySet)

    // deterministic across runs and input order
    val rerun = Sampling.weightedSample(d.orderBy($"doc_id".desc), "lang",
      rates, defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    assert(rerun === kept.keySet)

    // rate 0 drops the category entirely
    val none = Sampling.weightedSample(d, "lang", Map("en" -> 0.0),
      defaultRate = 1.0).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!none.values.exists(_ == "en"))
    assert(none.values.count(_ == "zh") === 1000 && none.values.count(_ == "de") === 1000)
  }

  test("mixtureRates: max-retention plan, binding category keeps all, absent share drops") {
    val d = ids(1000).withColumn("lang",
      when($"doc_id" <= 600, "en")
        .when($"doc_id" <= 900, "de")
        .when($"doc_id" <= 1000 - 50, "zh").otherwise("xx"))
    // counts: en 600, de 300, zh 50, xx 50; shares en .5, de .3, zh .2
    // n/share: en 1200, de 1000, zh 250 -> K = 250
    // rates: en 250*.5/600 = 0.208333, de 250*.3/300 = 0.25, zh 1.0, xx 0
    val got = Sampling.mixtureRates(d, "lang",
        Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    assert(got("en") === ((600L, 0.208333)))
    assert(got("de") === ((300L, 0.25)))
    assert(got("zh") === ((50L, 1.0)), "binding category keeps everything")
    assert(got("xx") === ((50L, 0.0)), "category without a share is dropped")
    // executing the plan yields the target mixture in expectation:
    // kept ~ K * share = (125, 75, 50)
    val rates = got.view.mapValues(_._2).toMap
    val kept = Sampling.weightedSample(d, "lang", rates).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("zh") === 50L)
    assert(!kept.contains("xx"))
    val en = kept("en").toDouble
    assert(en > 85 && en < 165, s"en kept $en, expected ~125") // ±5 sigma
  }

  test("resampleToMixture == mixtureRates + weightedSample, fully in-plan") {
    val d = ids(1000).withColumn("lang",
      when($"doc_id" <= 600, "en")
        .when($"doc_id" <= 900, "de")
        .when($"doc_id" <= 950, "zh").otherwise("xx"))
    val shares = Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2)
    val inPlan = Sampling.resampleToMixture(d, "lang", shares)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // reference composition: collect the tiny rate table, then weightedSample
    val rates = Sampling.mixtureRates(d, "lang", shares)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val composed = Sampling.weightedSample(d, "lang", rates, defaultRate = 0.0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inPlan === composed, "one-plan form must equal the collected composition")
    // binding category (zh: n/share = 250, the min) keeps everything
    assert(inPlan.values.count(_ == "zh") === 50)
    // absent category drops entirely
    assert(!inPlan.values.exists(_ == "xx"))
  }

  test("capPerCategory: exact quota, hash-chosen, reorder-stable") {
    val d = ids(300).withColumn("source",
      when($"doc_id" <= 200, "big").otherwise("small"))
    val kept = Sampling.capPerCategory(d, "source", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(kept.count(_._2 == "big") === 5)
    assert(kept.count(_._2 == "small") === 5)
    // stable under input reordering (rank is over hash, not arrival)
    val reordered = Sampling.capPerCategory(d.orderBy($"doc_id".desc), "source", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(kept.toSet === reordered.toSet)
    // a quota above the category size keeps the whole category
    val all = Sampling.capPerCategory(d, "source", k = 1000)
    assert(all.count() === 300)
    // membership is the k smallest hashes per category, so shrinking k nests
    val kept3 = Sampling.capPerCategory(d, "source", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept3.subsetOf(kept.map(_._1).toSet), "quota sets must nest as k shrinks")
  }

  test("packByTokenBudget: shard-local contiguous bins, boundary-straddle bounded") {
    val docs = (1L to 400L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tokens")
    val budget = 100L
    val packed = Sampling.packByTokenBudget(docs, "n_tokens", budget, shards = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_before"), r.getAs[Long]("bin")))
    assert(packed.length === 400)
    packed.foreach { case (id, shard, _, _, _) => assert(shard === id % 4) }
    // bin definition is exact: every doc's tokens_before lies inside its
    // bin's token range, and a bin only closes once its boundary is crossed
    packed.foreach { case (id, shard, _, before, bin) =>
      assert(before >= bin * budget && before < (bin + 1) * budget,
        s"doc $id (shard $shard): tokens_before $before outside bin $bin")
    }
    packed.groupBy(t => (t._2, t._5)).foreach { case ((shard, bin), rows) =>
      val maxBin = packed.filter(_._2 == shard).map(_._5).max
      if (bin < maxBin) {
        val last = rows.maxBy(_._4)
        assert(last._4 + last._3 >= (bin + 1) * budget,
          s"bin ($shard,$bin) closed before crossing its boundary")
      }
    }
    // bins are contiguous in id order within a shard
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val binsInOrder = rows.sortBy(_._1).map(_._5)
      assert(binsInOrder === binsInOrder.sorted, "bins must be monotonic in id order")
    }
    // tokens_before is the running sum excluding self
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, before, _) =>
        assert(before === run); run += n
      }
    }
  }

  test("epochShards: full coverage per epoch, distinct stable permutations") {
    val docs = (1 to 1000).map(_.toLong).toDF("doc_id")
    val a = Sampling.epochShards(docs, epochs = 3, shards = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))

    // every (doc, epoch) exactly once; shards in range
    assert(a.length === 3000)
    assert(a.map(t => (t._1, t._2)).distinct.length === 3000)
    assert(a.forall(t => t._4 >= 0 && t._4 < 16))

    // epochs produce DIFFERENT orders: doc ranking by key differs across epochs
    def order(e: Int) = a.filter(_._2 == e).sortBy(_._3).map(_._1).toSeq
    assert(order(0) !== order(1))
    assert(order(1) !== order(2))

    // determinism: a second evaluation is identical
    val b = Sampling.epochShards(docs, epochs = 3, shards = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(a.sortBy(t => (t._1, t._2)) === b.sortBy(t => (t._1, t._2)))

    // occupancy is near-uniform: no shard more than 2x the mean
    val occ = a.filter(_._2 == 0).groupBy(_._4).map(_._2.length)
    assert(occ.max <= 2 * (1000 / 16), s"skewed shards: $occ")
  }

  test("exactStratifiedSample: every stratum hits exactly ceil(n*num/den) rows") {
    // Stratum sizes 1..6 at rate 1/3 -> quotas 1,1,1,2,2,2.
    val rows = (1 to 6).flatMap(s => (1 to s).map(i => (s * 100L + i, s"s$s")))
    val df = rows.toDF("doc_id", "source")
    val kept = Sampling.exactStratifiedSample(df, num = 1, den = 3, stratumCol = "source")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val bySrc = kept.groupBy(_._2).map { case (k, v) => k -> v.length }
    assert(bySrc === Map("s1" -> 1, "s2" -> 1, "s3" -> 1, "s4" -> 2, "s5" -> 2, "s6" -> 2))
    // num = den keeps everything; num = 0 keeps nothing.
    assert(Sampling.exactStratifiedSample(df, 3, 3, "source").count() === rows.length.toLong)
    assert(Sampling.exactStratifiedSample(df, 0, 3, "source").count() === 0L)
  }

  test("exactStratifiedSample: membership is hash-deterministic and reorder-stable") {
    val rows = (1L to 90L).map(i => (i, s"s${i % 3}"))
    val df = rows.toDF("doc_id", "source")
    val a = Sampling.exactStratifiedSample(df, 1, 5, "source")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.exactStratifiedSample(df.orderBy(org.apache.spark.sql.functions.rand(42)), 1, 5, "source")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a === b, "kept set must not depend on input order")
    assert(a.size === 18) // 3 strata x ceil(30/5)
  }

  test("weightedReservoir: brute-force key parity, without replacement, " +
      "heavy weights dominate") {
    val rows = (1L to 60L).map(i =>
      (i, s"s${i % 2}", if (i <= 4) 1000000.0 else 1.0))
    val df = rows.toDF("doc_id", "stratum", "w")
    val got = Sampling.weightedReservoir(df, col("w"), k = 5,
        strataCols = Seq("stratum")).collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rank")))
    // without replacement + exactly k per stratum
    assert(got.map(_._2).distinct.length === got.length)
    assert(got.groupBy(_._1).values.forall(_.length === 5))
    // brute-force A-ES locally with the same hash/key arithmetic
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|graft-aes".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      BigDecimal(math.log((h + 1.0) / 1152921504606846976.0) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = rows.groupBy(_._2).flatMap { case (st, rs) =>
      rs.map { case (id, _, w) => (id, key(id, w)) }
        .sortBy { case (id, k) => (-k, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (st, id, i + 1) }
    }.toSet
    assert(got.toSet === expect)
    // the 4 million-weight docs (2 per stratum) must all be sampled:
    // their keys sit ~1e6 closer to zero than any unit-weight key
    assert(Set(1L, 2L, 3L, 4L).subsetOf(got.map(_._2).toSet))
  }

  test("DSIR: weights and Gumbel-top-k selection match a local brute force " +
      "on a two-domain fixture") {
    val targetRows = Seq((1L, "apple banana apple"), (2L, "banana cherry banana"))
    val rawRows = Seq(
      (10L, "apple banana apple"), // pure target vocabulary
      (11L, "dog emu fox dog"),    // pure raw-only vocabulary
      (12L, "apple dog"))          // mixed
    val target = targetRows.toDF("doc_id", "text")
    val raw = rawRows.toDF("doc_id", "text")
    val B = 64

    // local mirror of the engine arithmetic, end to end
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
    }
    def round6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def feats(t: String): Seq[String] = {
      val w = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucketCounts(rows: Seq[(Long, String)]): Map[Long, Long] =
      rows.flatMap { case (_, t) => feats(t).map(f => h60(f) % B) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tC = bucketCounts(targetRows)
    val rC = bucketCounts(rawRows)
    val tt = tC.values.sum; val tr = rC.values.sum
    def lr(b: Long): BigDecimal = round6(
      math.log((tC.getOrElse(b, 0L) + 1.0) / (tt + B)) -
        math.log((rC.getOrElse(b, 0L) + 1.0) / (tr + B)))
    def logw(t: String): BigDecimal =
      feats(t).map(f => h60(f) % B).groupBy(identity)
        .map { case (b, fs) => lr(b) * fs.size }.sum
    val expectW = rawRows.map { case (id, t) => id -> logw(t) }.toMap

    val gotW = Sampling.dsirWeights(raw, target, buckets = B).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        BigDecimal(r.getAs[java.math.BigDecimal]("logw"))).toMap
    assert(gotW.keySet === expectW.keySet)
    expectW.foreach { case (id, w) =>
      assert(gotW(id) == w, s"doc $id: got ${gotW(id)}, expected $w")
    }
    // the interpretable ordering: pure-target vocab > mixed > pure-raw
    assert(gotW(10L) > gotW(12L) && gotW(12L) > gotW(11L))

    // Gumbel-top-k selection mirrors the same local arithmetic
    def gumbel(id: Long): BigDecimal = round6(
      -math.log(-math.log(((h60(s"graft-dsir:$id") % 1000000) + 1) / 1000001.0)))
    val scores = rawRows.map { case (id, _) => id -> (expectW(id) + gumbel(id)) }
    val expectTop = scores.sortBy { case (id, s) => (-s, id) }.take(2)
    val gotTop = Sampling.dsirResample(raw, target, k = 2, buckets = B)
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(gotTop.map(_._1).toSeq === expectTop.map(_._1))
    gotTop.zip(expectTop).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es.toDouble) < 1e-9)
    }

    // classifier filtering over the SAME models: NB log-odds = prior +
    // logw, posterior = sigmoid, kept iff pareto(9) > 1 - posterior —
    // every column brute-forced locally with identical arithmetic
    val prior = round6(math.log(targetRows.size.toDouble / rawRows.size))
    def pareto(id: Long): BigDecimal = round6(
      math.pow(((h60(s"graft-clf:$id") % 1000000) + 1) / 1000001.0, -1.0 / 9.0) - 1.0)
    val gotClf = Sampling.classifierFilter(raw, target, buckets = B).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logodds"),
        r.getAs[Double]("posterior"), r.getAs[Double]("pareto_draw"),
        r.getAs[Boolean]("kept"))).sortBy(_._1)
    assert(gotClf.map(_._1).toSeq === rawRows.map(_._1))
    gotClf.foreach { case (id, lo, post, pd, kept) =>
      val expLo = prior + expectW(id)
      val expPost = round6(1.0 / (1.0 + math.exp(-expLo.toDouble))).toDouble
      val expPd = pareto(id).toDouble
      assert(math.abs(lo - expLo.toDouble) < 1e-9, s"doc $id logodds")
      assert(post === expPost, s"doc $id posterior")
      assert(pd === expPd, s"doc $id pareto")
      assert(kept === (expPd > 1.0 - expPost), s"doc $id kept")
    }
    // the interpretable ordering carries through the sigmoid
    val postOf = gotClf.map(t => t._1 -> t._3).toMap
    assert(postOf(10L) > postOf(12L) && postOf(12L) > postOf(11L))
  }
}
