package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming rate-anomaly scoring must equal the batch q121 semantics on
  * the same data: trailing-24h z-scores over PRESENT hours only, n>=12
  * gate, identical arithmetic. */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  // 40 hours of synthetic traffic for two event types: type "a"
  // alternating 4/6 per hour (nonzero baseline variance — a constant
  // baseline has var 0 and z is defined 0 there) with one 50-count spike
  // at hour 30 (a certain anomaly), type "b" alternating 3/9 (higher
  // variance, spike-free), with hours 17-18 MISSING for "a" (the baseline
  // must shrink, not stretch)
  private def syntheticEvents: Seq[(Timestamp, String)] = {
    val h0 = 1700000000L / 3600 * 3600 // hour-aligned epoch
    def at(hour: Int, n: Int, typ: String): Seq[(Timestamp, String)] =
      (0 until n).map(i =>
        (new Timestamp((h0 + hour * 3600L) * 1000L + i * 1000L), typ))
    (0 until 40).flatMap { h =>
      val a =
        if (h == 17 || h == 18) Seq.empty
        else if (h == 30) at(h, 50, "a")
        else at(h, if (h % 2 == 0) 4 else 6, "a")
      val b = at(h, if (h % 2 == 0) 3 else 9, "b")
      a ++ b
    }
  }

  /** q121's batch arithmetic over the same event rows (hourly groupBy,
    * RANGE frame, textbook variance) — the oracle the stream must match. */
  private def batchVerdicts = {
    val ev = syntheticEvents.toDF("ts", "event_type")
    val hourly = ev.groupBy($"event_type",
        unix_seconds(date_trunc("hour", $"ts")).as("hour_epoch"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"event_type").orderBy($"hour_epoch")
      .rangeBetween(-86400, -3600)
    hourly
      .withColumn("n_tr", count(lit(1)).over(w))
      .withColumn("sum_tr", sum($"cnt").over(w))
      .withColumn("sumsq_tr", sum($"cnt" * $"cnt").over(w))
      .filter($"n_tr" >= 12)
      .withColumn("mean_tr", $"sum_tr".cast("double") / $"n_tr")
      .withColumn("var_tr",
        ($"sumsq_tr".cast("double") - $"sum_tr".cast("double") * $"sum_tr" / $"n_tr") /
          ($"n_tr" - 1))
      .withColumn("z", when($"var_tr" > 0,
        round(($"cnt" - $"mean_tr") / sqrt($"var_tr"), 6)).otherwise(0.0))
      .select($"event_type", $"hour_epoch", $"cnt", $"n_tr",
        round($"mean_tr", 6).as("mean_tr"), $"z",
        (abs($"z") >= 3.0).as("is_anomaly"))
  }

  test("streaming verdicts equal the batch q121 semantics, cross-batch") {
    graft.streaming.Pipelines.configureStateStore(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-anomaly").toString
    val q = StreamingAnomaly.hourlyVerdicts(
        stream.toDF().toDF("ts", "event_type"))
      .writeStream.queryName("anomaly_t").outputMode("append").format("memory")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // three micro-batches split MID-HISTORY: state must carry the ring
      // across batches for the later hours' baselines to be complete
      val (b1, rest) = syntheticEvents.partition(_._1.getTime <
        (1700000000L / 3600 * 3600 + 20 * 3600L) * 1000L)
      val (b2, b3) = rest.partition(_._1.getTime <
        (1700000000L / 3600 * 3600 + 33 * 3600L) * 1000L)
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      stream.addData(b3)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("anomaly_t")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_epoch")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("n_tr"),
          r.getAs[Double]("mean_tr"), r.getAs[Double]("z"),
          r.getAs[Boolean]("is_anomaly"))))
      .toMap

    // the stream cannot emit hours the watermark never passed: the batch
    // truth restricted to hours whose END precedes the final watermark
    // (last event ts - 2h delay) is exactly what must have been emitted
    val lastTs = syntheticEvents.map(_._1.getTime).max
    val horizon = lastTs / 1000L - 2 * 3600
    val exp = batchVerdicts
      .filter($"hour_epoch" + 3600 <= horizon)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_epoch")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("n_tr"),
          r.getAs[Double]("mean_tr"), r.getAs[Double]("z"),
          r.getAs[Boolean]("is_anomaly"))))
      .toMap

    assert(exp.nonEmpty, "fixture must produce scored hours")
    assert(got.keySet === exp.keySet,
      s"emitted hour set mismatch: missing ${exp.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- exp.keySet}")
    exp.foreach { case (k, v) =>
      assert(got(k) === v, s"verdict mismatch at $k")
    }
    // the planted spike is flagged and is the ONLY anomaly
    val anomalies = got.filter(_._2._5).keys.toSeq
    assert(anomalies.map(_._1) === Seq("a"), s"only the spike flags: $anomalies")
    assert(got.count(_._2._5) === 1)
  }

  test("missing hours shrink the trailing baseline (n_tr reflects present hours)") {
    // pure-Scala check of the shared scorer: 12 present hours score, 11 do
    // not reach the gate, and the epoch-range filter drops out-of-horizon
    // entries
    val cur = StreamingAnomaly.HourCnt(100 * 3600L, 10)
    val trailing = (76 until 100).filterNot(h => h == 80 || h == 81)
      .map(h => StreamingAnomaly.HourCnt(h * 3600L, 5L))
    val (n, mean, z, flag) = StreamingAnomaly.score(cur, trailing)
    assert(n === 22L) // 24 hours minus 2 missing
    assert(mean === 5.0)
    assert(z === 0.0 && !flag) // zero variance -> z 0 by contract
  }
}
