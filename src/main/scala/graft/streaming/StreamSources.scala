package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source abstraction producing "Kafka-shaped frames": a streaming DataFrame
  * with `value: string` (the JSON event) and `kafka_timestamp: timestamp`
  * (broker receive time). Everything downstream — decode, keyed state,
  * sinks — is source-agnostic, so tests drive the identical pipeline from a
  * MemoryStream or a file directory while production subscribes to Kafka.
  *
  * The Kafka options mirror the reference exactly
  * (spark_job/spark_streaming.py:572-583 VOD, :589-599 live):
  * startingOffsets=latest, failOnDataLoss=false, per-topic
  * maxOffsetsPerTrigger (10 VOD / 100 live) as the admission-control /
  * backpressure knob (T8/T9/W3).
  */
object StreamSources {

  /** Kafka subscription settings for one topic. */
  final case class KafkaShape(
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long,
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = false)

  val VodShape: String => KafkaShape =
    KafkaShape(_, "vod-chunks", maxOffsetsPerTrigger = 10L)
  val LiveShape: String => KafkaShape =
    KafkaShape(_, "live-chunks", maxOffsetsPerTrigger = 100L)

  /** Kafka source scan (S1/S2). Compiles against the built-in `kafka`
    * format; requires spark-sql-kafka on the classpath at runtime. */
  def kafka(spark: SparkSession, shape: KafkaShape): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", shape.bootstrapServers)
      .option("subscribe", shape.topic)
      .option("startingOffsets", shape.startingOffsets)
      .option("maxOffsetsPerTrigger", shape.maxOffsetsPerTrigger.toString)
      .option("failOnDataLoss", shape.failOnDataLoss.toString)
      .load()
      .selectExpr("CAST(value AS STRING) AS value", "timestamp AS kafka_timestamp")

  /** File-based stand-in: each text line in `dir` is one JSON event.
    * `maxFilesPerTrigger` plays the maxOffsetsPerTrigger role. */
  def fileJsonLines(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(dir)
      .select(col("value"), current_timestamp().as("kafka_timestamp"))

  /** Adapt any `value: string` streaming DataFrame (e.g. a MemoryStream in
    * tests) to the frame shape. */
  def frames(values: DataFrame): DataFrame =
    if (values.columns.contains("kafka_timestamp")) values
    else values.select(col("value"), current_timestamp().as("kafka_timestamp"))
}
