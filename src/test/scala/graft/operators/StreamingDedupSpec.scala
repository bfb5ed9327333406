package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming LSH near-dup filter: bucket claim -> exact-Jaccard refinement
  * in keyed state, cross-batch, with the batch banding's exact bucket
  * formula. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single afternoon"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog while the cat watches from the cold windowsill every single afternoon"
  private val different =
    "columnar execution engines vectorize expression evaluation across record batches for throughput"

  test("jaccardSorted: merge walk over sorted distinct arrays") {
    assert(StreamingDedup.jaccardSorted(Array(1L, 2L, 3L), Array(2L, 3L, 4L)) === 0.5)
    assert(StreamingDedup.jaccardSorted(Array.emptyLongArray, Array.emptyLongArray) === 0.0)
    assert(StreamingDedup.jaccardSorted(Array(1L), Array.emptyLongArray) === 0.0)
    val hs = StreamingDedup.hashSet(base, 3)
    assert(StreamingDedup.jaccardSorted(hs, hs) === 1.0)
    assert(hs.toSeq === hs.toSeq.sorted && hs.toSeq.distinct === hs.toSeq)
  }

  test("streaming near-dup: later arrival in a claimed bucket is flagged with exact jaccard") {
    // pick a band where the fixture pair actually collides (j ~ 0.9 pairs
    // agree on at least one of 16 bands w.p. 1 - 3e-8; which one is
    // fixture-determined, so compute it with the SAME batch formula)
    val pairBuckets = Seq(base, nearDup).toDF("text")
    val collidingBand = (0 until 16).find { b =>
      pairBuckets.select(StreamingDedup.bandBucket($"text", b).as("k"))
        .collect().map(_.getLong(0)).distinct.length == 1
    }
    assert(collidingBand.isDefined, "fixture pair should share at least one band")

    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-neardup").toString
    val q = StreamingDedup.nearDupVerdicts(
        stream.toDF().toDF("doc_id", "text"), threshold = 0.5,
        band = collidingBand.get)
      .writeStream.queryName("neardup_t").outputMode("update").format("memory")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData((1L, base))
      q.processAllAvailable()
      stream.addData(Seq((2L, nearDup), (3L, different))) // separate batch: state must persist
      q.processAllAvailable()
    } finally q.stop()

    val verdicts = spark.table("neardup_t")
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Boolean]("near_dup"), Option(r.getAs[String]("dup_of")), r.getAs[Double]("jaccard")))
      .toMap
    assert(verdicts("1") === ((false, None, 0.0)), "first claimant is clean")
    val (dup2, of2, j2) = verdicts("2")
    assert(dup2, "cross-batch near-dup must be flagged")
    assert(of2 === Some("1"))
    assert(j2 >= 0.5 && j2 < 1.0)
    // the exact jaccard matches the batch refinement's value for this pair
    val batchJ = StreamingDedup.jaccardSorted(
      StreamingDedup.hashSet(base, 3), StreamingDedup.hashSet(nearDup, 3))
    assert(math.abs(j2 - batchJ) < 1e-12)
    val (dup3, of3, _) = verdicts("3")
    assert(!dup3 && of3.isEmpty, "unrelated doc passes (bucket differs or refinement rejects)")
  }

  test("multi-band near-dup: catches a j~0.9 pair that single-probe (band 0) provably misses") {
    // build a fixture pair that does NOT collide on band 0 (single-probe
    // would miss it, p ~ 0.34 per variant at j ~ 0.9) but does collide on
    // some band (p ~ 1 - 3e-8 over 16) — found deterministically by swapping
    // one word at a time through the SAME batch bucket formula
    val words = base.split(" ")
    def bucketsOf(t: String): Seq[Long] = {
      val df = Seq(t).toDF("text")
      (0 until 16).map(b =>
        df.select(StreamingDedup.bandBucket($"text", b).as("k")).head().getLong(0))
    }
    val baseBuckets = bucketsOf(base)
    val variant = words.indices.iterator.map { i =>
      words.updated(i, "swapped").mkString(" ")
    }.find { v =>
      val vb = bucketsOf(v)
      vb.head != baseBuckets.head && // band 0 misses: single-probe is blind
        vb.zip(baseBuckets).exists { case (a, b) => a == b } // some band hits
    }
    assert(variant.isDefined, "no one-word variant misses band 0 but hits another band")

    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-neardup-mb").toString
    val q = StreamingDedup.nearDupVerdictsMultiBand(
        stream.toDF().toDF("doc_id", "text"), threshold = 0.5)
      .writeStream.queryName("neardup_mb").outputMode("update").format("memory")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData((1L, base))
      q.processAllAvailable()
      // separate batch: every band's claimed state must persist
      stream.addData(Seq((2L, variant.get), (3L, different)))
      q.processAllAvailable()
    } finally q.stop()

    val verdicts = spark.table("neardup_mb")
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Boolean]("near_dup"), Option(r.getAs[String]("dup_of")), r.getAs[Double]("jaccard")))
      .toMap
    // exactly ONE verdict per doc despite 16 banded rows each
    assert(spark.table("neardup_mb").count() === 3)
    assert(verdicts("1") === ((false, None, 0.0)), "first claimant is clean in all bands")
    val (dup2, of2, j2) = verdicts("2")
    assert(dup2, "multi-band must catch the pair single-probe misses")
    assert(of2 === Some("1"))
    val batchJ = StreamingDedup.jaccardSorted(
      StreamingDedup.hashSet(base, 3), StreamingDedup.hashSet(variant.get, 3))
    assert(math.abs(j2 - batchJ) < 1e-12, "flag carries the exact batch-refinement jaccard")
    assert(j2 >= 0.5)
    val (dup3, of3, _) = verdicts("3")
    assert(!dup3 && of3.isEmpty)
  }

  test("streaming passage filter: cross-batch verbatim passage flagged, count matches batch pairs") {
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val docA = s"first document preamble then $passage and an ending"
    val docB = s"totally unrelated opening where $passage appears verbatim too"
    val docC = "columnar engines vectorize expression evaluation across batches"

    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-passage").toString
    val q = StreamingDedup.passageVerdicts(
        stream.toDF().toDF("doc_id", "text"), minShared = 2)
      .writeStream.queryName("passage_t").outputMode("update").format("memory")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData((1L, docA))
      q.processAllAvailable()
      // separate batch: fingerprint claims must persist in state
      stream.addData(Seq((2L, docB), (3L, docC)))
      q.processAllAvailable()
      // third doc sharing the passage still attributes to the FIRST claimant
      stream.addData((4L, docB + " with an extra tail"))
      q.processAllAvailable()
    } finally q.stop()

    val verdicts = spark.table("passage_t")
      .collect().map(r => r.getAs[String]("id") ->
        ((r.getAs[Boolean]("flagged"), Option(r.getAs[String]("overlap_with")),
          r.getAs[Long]("shared_fp"))))
      .toMap
    assert(verdicts("1")._1 === false, "first claimant is clean")
    val (fb, ob, nb) = verdicts("2")
    assert(fb && ob === Some("1"), s"doc 2 must flag against doc 1: ${verdicts("2")}")
    // streamed shared-fingerprint count equals the batch pair operator's
    // n_shared_fp (no third claimant stole any window here)
    import spark.implicits._
    val batch = Dedup.sharedFingerprintPairs(
        Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"), minShared = 1)
      .collect()
    assert(batch.length === 1)
    assert(nb === batch.head.getAs[Long]("n_shared_fp"),
      "streamed count must equal the batch pair count")
    assert(verdicts("3") === ((false, None, 0L)), "unrelated doc gets a clean verdict")
    val (f4, o4, _) = verdicts("4")
    assert(f4 && o4 === Some("1"),
      "later passage copies attribute to the first claimant, cross-batch")
  }
}
