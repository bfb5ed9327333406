package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The STREAMING ingest curation pipeline end to end — the streaming
  * analogue of the q72/q78 batch funnels, composed from the same operator
  * family: heuristic quality gates (stateless, per-row) → decontamination
  * gate (stream-static, stateless) → multi-band streaming near-dup
  * (keyed state). Each stage drops exactly the doc planted to trip it,
  * across micro-batches, in ONE composed streaming query. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  // Gate-passing base material: 60 words cycled from a pool that clears
  // every heuristic gate (>= 50 words, mean word length in [3,10], all
  // alpha, 3 distinct stop words, no C4 markers).
  private val poolA =
    Seq("the", "and", "of", "data", "value", "table", "row", "part", "group", "line")
  private val poolE =
    Seq("customer", "order", "spark", "query", "filter", "scan", "merge", "the", "and", "of")
  private def cycled(pool: Seq[String], n: Int): Seq[String] =
    Iterator.continually(pool).flatten.take(n).toSeq

  private val docA = cycled(poolA, 60).mkString(" ")
  private val docB = "tiny doc" // fails the word-count gate
  // passes the gates but carries an eval 3-gram -> decontamination drops it
  private val docC =
    (cycled(poolA, 30) ++ Seq("alpha", "beta", "gamma") ++ cycled(poolA, 30)).mkString(" ")
  // near-dup of A: two words changed, shingle jaccard ~ 10/14 >= 0.5
  private val docD =
    (cycled(poolA, 58) ++ Seq("spark", "query")).mkString(" ")
  private val docE = cycled(poolE, 60).mkString(" ")

  private val evalDocs = Seq((900L, "alpha beta gamma delta")).toDF("doc_id", "text")

  test("quality -> decontamination -> streaming near-dup, cross-batch, one query") {
    // stage sanity IN BATCH first: the planted docs trip exactly their stage
    val all = Seq(1L -> docA, 2L -> docB, 3L -> docC, 4L -> docD, 5L -> docE)
      .toDF("doc_id", "text")
    val qualityKept = HeuristicFilters.qualityFilter(all)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(qualityKept === Set(1L, 3L, 4L, 5L), "only the short doc fails the gate pack")
    val deconKept = Decontamination.gate(all, evalDocs)
      .filter(!$"flagged").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(deconKept === Set(1L, 2L, 4L, 5L), "only the eval-gram carrier is contaminated")

    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val piped = StreamingDedup.nearDupVerdictsMultiBand(
      Decontamination.gate(HeuristicFilters.qualityFilter(docs), evalDocs)
        .filter(!$"flagged").drop("n_shared", "flagged"),
      threshold = 0.5)
    val q = piped.toDF().writeStream.format("memory").queryName("curation_out")
      .outputMode("update").start()
    try {
      stream.addData((1L, docA), (2L, docB), (3L, docC))
      q.processAllAvailable()
      stream.addData((4L, docD), (5L, docE))
      q.processAllAvailable()
      val out = spark.table("curation_out").collect()
        .map(r => r.getAs[String]("id") ->
          ((r.getAs[Boolean]("near_dup"), Option(r.getAs[String]("dup_of")))))
        .toMap
      assert(out.keySet === Set("1", "4", "5"),
        "gate-dropped docs (2: quality, 3: decontamination) never reach dedup state")
      assert(out("1") === ((false, None)), "first copy is the canonical survivor")
      assert(out("4") === ((true, Some("1"))),
        "the near-dup planted in batch 2 flags against batch 1's claimant")
      assert(out("5") === ((false, None)), "the distinct clean doc survives")
    } finally q.stop()
  }
}
