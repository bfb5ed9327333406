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
}
