package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-shape utilities for the shuffle checklist at 100 TB scale
  * (SURVEY.md §4): salting for skewed keys, bucketing for co-located
  * (shuffle-free) repeat joins. AQE's skew-join handles many cases at
  * runtime; salting is for the pathological keys AQE splits can't fix
  * (a single key larger than executor memory), and bucketing removes the
  * shuffle entirely for join keys used query-after-query.
  */
object JoinStrategies {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, salts) derived from `rowKey` (any column
    * distinct-ish per row), the small/right side is exploded `salts` times,
    * and the join key becomes (key, salt) — one hot key now spreads over
    * `salts` shuffle partitions. Result equals the plain inner join. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      rowKey: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = skewed.withColumn("__salt", pmod(xxhash64(col(rowKey)), lit(salts)).cast("int"))
    val r = other
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * co-located (no Exchange). Spark bucketing requires table metadata, so
    * this registers managed tables `<name>` in the session catalog. */
  def writeBucketed(
      df: DataFrame,
      name: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Join two previously-bucketed tables on their bucket key. With equal
    * bucket counts the plan contains NO shuffle exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
