package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** SpaceSaving streaming heavy hitters: exact-when-under-capacity parity
  * with a batch groupBy, the textbook error guarantees under eviction, and
  * deterministic eviction order. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(
      batches: Seq[Seq[(String, String)]],
      capacity: Int,
      k: Int): Seq[StreamingTopK.TopKRow] = {
    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-topk").toString
    val q = StreamingTopK.topK(
        stream.toDF().toDF("group", "item"), capacity = capacity, k = k)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table("topk_out").as[StreamingTopK.TopKRow].collect().toSeq
  }

  test("under capacity: final snapshot equals exact batch counts, err 0") {
    val batches = Seq(
      Seq("a" -> "x", "a" -> "x", "a" -> "y", "b" -> "p"),
      Seq("a" -> "y", "a" -> "z", "b" -> "p", "b" -> "q"),
      Seq("a" -> "x", "b" -> "q", "b" -> "q"))
    val rows = runStream(batches, capacity = 16, k = 10)
    val lastSnap = rows.groupBy(_.group).map { case (g, rs) => g -> rs.map(_.snap).max }
    val finalRows = rows.filter(r => r.snap == lastSnap(r.group))
    val exact = batches.flatten.groupBy(identity).map { case ((g, i), v) => (g, i) -> v.size.toLong }
    finalRows.foreach { r =>
      assert(r.cnt === exact((r.group, r.item)), s"$r")
      assert(r.err === 0L)
    }
    assert(finalRows.filter(_.group == "a").map(_.item).toSet === Set("x", "y", "z"))
    // rank order: cnt desc then item; x(3) before y(2) before z(1)
    assert(finalRows.filter(_.group == "a").sortBy(_.rank).map(_.item) === Seq("x", "y", "z"))
    assert(finalRows.find(r => r.group == "a" && r.item == "x").get.n_total === 6L)
  }

  test("over capacity: SpaceSaving guarantees hold (coverage + error bounds)") {
    // One group, capacity 3. True counts: h1=30, h2=20, noise n1..n10 = 1.
    val heavy = Seq.fill(30)("g" -> "h1") ++ Seq.fill(20)("g" -> "h2")
    val noise = (1 to 10).map(i => "g" -> f"n$i%02d")
    // interleave noise between the heavy runs across batches
    val batches = Seq(heavy.take(15) ++ noise.take(5), noise.drop(5) ++ heavy.drop(15))
    val rows = runStream(batches, capacity = 3, k = 3)
    val finalSnap = rows.map(_.snap).max
    val fin = rows.filter(_.snap == finalSnap)
    val n = 60L
    assert(fin.head.n_total === n)
    val byItem = fin.map(r => r.item -> r).toMap
    // any item with true count > N/capacity = 20 must be present
    assert(byItem.contains("h1"))
    val h1 = byItem("h1")
    assert(h1.cnt >= 30L && h1.cnt - h1.err <= 30L, s"$h1")
    fin.foreach { r => assert(r.err <= n / 3, s"err bound violated: $r") }
    // estimates never undercount: est >= true
    assert(byItem.get("h2").forall(r => r.cnt >= 20L))
  }

  test("fold: eviction picks the minimum (cnt, item) counter deterministically") {
    val cs = Seq(
      StreamingTopK.Counter("a", 5, 0),
      StreamingTopK.Counter("b", 2, 0),
      StreamingTopK.Counter("c", 2, 0))
    val out = StreamingTopK.fold(cs, Seq(("d", 1L)), capacity = 3)
    // min is (2,"b") by item tiebreak -> d inherits cnt 2 + 1, err 2
    assert(out.map(c => (c.item, c.cnt, c.err)).toSet ===
      Set(("a", 5L, 0L), ("c", 2L, 0L), ("d", 3L, 2L)))
  }

  test("fold: existing item increments in place without eviction") {
    val cs = Seq(StreamingTopK.Counter("a", 5, 1), StreamingTopK.Counter("b", 2, 0))
    val out = StreamingTopK.fold(cs, Seq(("a", 4L), ("b", 1L)), capacity = 2)
    assert(out.map(c => (c.item, c.cnt, c.err)).toSet ===
      Set(("a", 9L, 1L), ("b", 3L, 0L)))
  }

  test("weighted input: NULL and negative weights are ignored, positives sum") {
    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String, java.lang.Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-topkw").toString
    val q = StreamingTopK.topK(
        stream.toDF().toDF("group", "item", "wt"),
        capacity = 8, k = 5, weightCol = Some("wt"))
      .writeStream.format("memory").queryName("topkw_out")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      stream.addData(Seq(
        ("g", "a", java.lang.Long.valueOf(3L)),
        ("g", "a", java.lang.Long.valueOf(2L)),
        ("g", "b", null.asInstanceOf[java.lang.Long]),  // ignored
        ("g", "c", java.lang.Long.valueOf(-7L)),        // ignored
        ("g", "d", java.lang.Long.valueOf(1L))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("topkw_out").as[StreamingTopK.TopKRow].collect()
    val byItem = rows.map(r => r.item -> r.cnt).toMap
    assert(byItem === Map("a" -> 5L, "d" -> 1L))
    assert(rows.head.n_total === 6L)
  }
}
