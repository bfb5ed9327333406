package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketches at ingestion time: because an HLL register is a plain
  * `max` aggregate, the register frame is INCREMENTAL for free under
  * Structured Streaming — no custom state processor, no replay. This spec
  * pins the property that makes the sketch family a streaming citizen:
  * registers built from a stream across multiple triggers equal the batch
  * registers over the union of the data, so estimates agree exactly. */
class SketchStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val B = 8

  test("streaming HLL registers across batches == batch registers over the union") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val regs = Sketches.hllRegisters(
      stream.toDF().withColumnRenamed("value", "x").withColumn("g", lit(1)),
      Seq("g"), col("x"), B)
    val q = regs.writeStream
      .format("memory").queryName("hll_stream")
      .outputMode("complete")
      .start()
    try {
      stream.addData((1 to 400).map(i => s"a-$i"): _*)
      q.processAllAvailable()
      stream.addData((200 to 600).map(i => s"a-$i"): _*) // overlap: dups must not move registers
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hll_stream")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val batch = Sketches.hllRegisters(
        (1 to 600).map(i => s"a-$i").toDF("x").withColumn("g", lit(1)),
        Seq("g"), col("x"), B)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(streamed === batch,
      "cross-trigger streaming registers must equal the batch sketch")

    // and the estimate computed from the streamed registers is the batch one
    val se = Sketches.hllEstimate(spark.table("hll_stream"), Seq("g"), B)
      .collect().head.getAs[Double]("hll_estimate")
    val be = Sketches.hllEstimate(
      (1 to 600).map(i => s"a-$i").toDF("x").withColumn("g", lit(1))
        .transform(d => Sketches.hllRegisters(d, Seq("g"), col("x"), B)),
      Seq("g"), B).collect().head.getAs[Double]("hll_estimate")
    assert(se === be)
  }

  test("HllAgg: streaming windowed aggregate across triggers == batch; " +
      "finish lands on hllEstimate's 6-dp grid point") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.functions.udaf
    val agg = udaf(new Sketches.HllAgg(B), Encoders.STRING)
    val part1 = (1 to 400).map(i => s"it-${i % 311}")
    val part2 = (150 to 600).map(i => s"it-${i % 311}") // heavy overlap
    val all = part1 ++ part2

    // batch: the aggregator's registers are identical to the frame path's,
    // so estimates agree on the shared 6-dp grid (summation order inside
    // finish vs the frame aggregate may differ in the last ulp)
    val batchEst = all.toDF("x").agg(agg(col("x")).as("e"))
      .head.getAs[Double]("e")
    val frameEst = Sketches.hllEstimate(
        Sketches.hllRegisters(all.toDF("x").withColumn("g", lit(1)),
          Seq("g"), col("x"), B), Seq("g"), B)
      .head.getAs[Double]("hll_estimate")
    assert(BigDecimal(batchEst).setScale(6, BigDecimal.RoundingMode.HALF_UP) ===
      BigDecimal(frameEst).setScale(6, BigDecimal.RoundingMode.HALF_UP))

    // streaming: same aggregate, two overlapping triggers, complete mode —
    // buffer merge is elementwise max, so the final estimate is EXACTLY
    // the batch aggregator's value
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val q = stream.toDF().withColumnRenamed("value", "x")
      .withColumn("g", lit(1))
      .groupBy(col("g")).agg(agg(col("x")).as("e"))
      .writeStream.format("memory").queryName("hll_agg_stream")
      .outputMode("complete")
      .start()
    try {
      stream.addData(part1: _*)
      q.processAllAvailable()
      stream.addData(part2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedEst = spark.table("hll_agg_stream")
      .head.getAs[Double]("e")
    assert(streamedEst === batchEst)
  }

  test("QuantileAgg: streaming groupBy across triggers == exact batch ranks (exact mode)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ps = Seq(0.25, 0.5, 0.9)
    val stream = MemoryStream[Double]
    val agg = udaf(new Sketches.QuantileAgg(512, ps),
      org.apache.spark.sql.Encoders.scalaDouble)
    val q = stream.toDF().withColumn("g", lit(1))
      .groupBy("g").agg(agg(col("value")).as("qs"))
      .writeStream.format("memory").queryName("qs_stream")
      .outputMode("complete").start()
    try {
      val rnd = new scala.util.Random(3)
      val all = rnd.shuffle((1 to 350).map(_.toDouble))
      stream.addData(all.take(200): _*)
      q.processAllAvailable()
      stream.addData(all.drop(200): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qs_stream")
      .collect().head.getSeq[Double](1)
    // capacity 512 >= 350: the cross-trigger state-store merges never
    // compact, so the result is EXACT rank selection over the union
    val expected = ps.map(p => math.ceil(p * 350).toDouble)
    assert(streamed === expected,
      "streaming quantile summary must equal exact batch ranks in exact mode")
  }

  test("streaming CMS cells across batches == batch cells over the union") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val cells = Sketches.cmsCells(
      stream.toDF().withColumnRenamed("value", "x"), Seq.empty, col("x"),
      d = 4, w = 256)
    val q = cells.writeStream
      .format("memory").queryName("cms_stream")
      .outputMode("complete")
      .start()
    try {
      stream.addData(Seq.fill(30)("hot") ++ Seq("a", "b", "c"): _*)
      q.processAllAvailable()
      stream.addData(Seq.fill(12)("hot") ++ Seq("d", "e"): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cms_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.cmsCells(
        (Seq.fill(42)("hot") ++ Seq("a", "b", "c", "d", "e")).toDF("x"),
        Seq.empty, col("x"), d = 4, w = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch,
      "cross-trigger streaming cells must equal the batch sketch")
    // the point query over the streamed sketch sees the full history
    val est = Sketches.cmsQuery(spark.table("cms_stream"), Seq.empty,
        Seq("hot").toDF("x"), col("x"), d = 4, w = 256)
      .collect().head.getAs[Long]("cms_estimate")
    assert(est === 42L)
  }

  test("streaming histogram cells across batches == batch cells over the union") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Double]
    val cells = Sketches.histogramCells(
      stream.toDF().withColumnRenamed("value", "v").withColumn("g", lit(1)),
      Seq("g"), col("v"), width = 5.0, b = 32)
    val q = cells.writeStream
      .format("memory").queryName("hist_stream")
      .outputMode("complete")
      .start()
    try {
      stream.addData((1 to 300).map(i => (i % 90).toDouble): _*)
      q.processAllAvailable()
      stream.addData((1 to 200).map(i => (i * 3 % 145).toDouble): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hist_stream")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val batch = Sketches.histogramCells(
        ((1 to 300).map(i => (i % 90).toDouble) ++
          (1 to 200).map(i => (i * 3 % 145).toDouble)).toDF("v")
          .withColumn("g", lit(1)),
        Seq("g"), col("v"), width = 5.0, b = 32)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(streamed === batch,
      "cross-trigger streaming histogram must equal the batch histogram")

    // quantiles read off the streamed cells match quantiles off batch cells
    val sq = Sketches.histogramQuantile(spark.table("hist_stream"), Seq("g"),
      0.9, 5.0).collect().head.getAs[Double]("quantile_estimate")
    val bq = Sketches.histogramQuantile(
      Sketches.histogramCells(
        ((1 to 300).map(i => (i % 90).toDouble) ++
          (1 to 200).map(i => (i * 3 % 145).toDouble)).toDF("v")
          .withColumn("g", lit(1)), Seq("g"), col("v"), 5.0, 32),
      Seq("g"), 0.9, 5.0).collect().head.getAs[Double]("quantile_estimate")
    assert(sq === bq)
  }
}
