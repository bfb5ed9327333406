package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture fold: an append-only event/update log becomes a
  * slowly-changing-dimension type-2 history (one row per value interval,
  * `valid_from`/`valid_to`/`is_current`/`version`).
  *
  * The whole operator is two key-partitioned window passes — no self-join,
  * no driver state. Partitioning is by the dimension key, so at 100 TB the
  * shuffle is one hash exchange on the key and every window evaluates
  * within its partition; AQE handles skewed keys. (Contrast with the naive
  * as-of self-join formulation, which shuffles the log twice and explodes
  * on hot keys.)
  */
object Scd2 {

  /** Fold `log` (one row per observed value of `valueCol` for `keyCol` at
    * `tsCol`) into SCD2 intervals. Ties on (key, ts) resolve by
    * `tieBreaker` descending (latest writer wins), making the fold
    * deterministic on at-least-once logs. Consecutive duplicate values
    * collapse into one interval. */
  def fromLog(log: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieBreaker: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(tsCol), col(tieBreaker).desc)
    // 1. late-writer dedup: keep the winning row per (key, ts)
    val winner = log
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col(tsCol))
          .orderBy(col(tieBreaker).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    // 2. change detection: keep rows whose value differs from the previous
    //    observation (null-safe: the first row always survives)
    val changes = winner
      .withColumn("__prev", lag(col(valueCol), 1).over(ordered))
      .filter(!(col(valueCol) <=> col("__prev"))).drop("__prev")
    // 3. interval construction
    changes
      .withColumn("version", row_number().over(ordered))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(ordered))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** The dimension as of time `at`: one row per key, the interval covering
    * `at` (keys first observed after `at` are absent). */
  def snapshotAt(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
      .drop("version", "valid_to", "is_current")
}
