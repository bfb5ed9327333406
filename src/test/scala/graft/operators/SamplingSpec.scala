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
}
