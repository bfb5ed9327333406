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

  /** Key-distribution profile for a prospective join/aggregation key — the
    * measurement that decides BETWEEN the strategies above before a 100 TB
    * shuffle is launched, instead of discovering the hot key from a dying
    * executor. One keyed count plus one tiny aggregate; emits the max/mean
    * skew ratio, the p99 per-key count, and a salt recommendation
    * (ceil of the skew ratio, capped, 1 when the key is balanced).
    *
    * `exactP99 = false` (the production default) uses approx_percentile:
    * Spark's exact `percentile` buffers every distinct per-key count in one
    * aggregation buffer, which at a billion keys is an executor OOM — the
    * GK sketch is bounded regardless of key cardinality. The oracle-pinned
    * catalog query (q96) passes `exactP99 = true` so the compare is exact;
    * the two modes differ only in that one column. */
  def skewProfile(df: DataFrame, key: String, label: String,
      maxSalts: Int = 32, exactP99: Boolean = false): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val p99 = if (exactP99) expr("percentile(cnt, 0.99)")
      else expr("approx_percentile(cnt, 0.99, 10000)").cast("double")
    counts.agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        round(p99, 6).as("p99_cnt"))
      .withColumn("mean_cnt",
        round(col("n_rows").cast("double") / col("n_keys").cast("double"), 6))
      .withColumn("skew_ratio",
        round(col("max_cnt").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"), 6))
      .withColumn("recommended_salts",
        least(lit(maxSalts.toLong),
          greatest(lit(1L), ceil(col("skew_ratio")).cast("long"))))
      .select(lit(label).as("rel"), col("n_rows"), col("n_keys"),
        col("max_cnt"), col("p99_cnt"), col("mean_cnt"), col("skew_ratio"),
        col("recommended_salts"))
  }

  /** The decision [[skewProfile]] feeds: pick the physical join strategy
    * for an equi-join BEFORE launching it. Rules, in order:
    *   1. either side fits the broadcast budget (row count, the planner's
    *      own proxy) → broadcast the smaller side: zero shuffle;
    *   2. the shuffled key is skewed past `skewThreshold` → salted
    *      shuffle with [[skewProfile]]'s capped salt count;
    *   3. otherwise → plain shuffle (sort-merge / shuffled-hash, Spark's
    *      choice).
    * One row out; cost is two keyed counts — vanishing next to the join
    * it sizes. Thresholds are explicit parameters so the policy is
    * testable, not buried. */
  def adviseJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, label: String,
      broadcastRows: Long = 1000000L, skewThreshold: Double = 4.0,
      maxSalts: Int = 32): DataFrame = {
    def side(df: DataFrame, key: String, prefix: String) =
      skewProfile(df, key, prefix, maxSalts)
        .select(col("n_rows").as(s"${prefix}_rows"),
          col("n_keys").as(s"${prefix}_keys"),
          col("skew_ratio").as(s"${prefix}_skew"),
          col("recommended_salts").as(s"${prefix}_salts"))
    side(left, leftKey, "left").crossJoin(side(right, rightKey, "right"))
      .withColumn("strategy",
        when(least(col("left_rows"), col("right_rows")) <= lit(broadcastRows),
          when(col("right_rows") <= col("left_rows"), lit("broadcast_right"))
            .otherwise(lit("broadcast_left")))
        .when(greatest(col("left_skew"), col("right_skew")) >= lit(skewThreshold),
          lit("salted_shuffle"))
        .otherwise(lit("shuffle")))
      .withColumn("salts",
        when(col("strategy") === "salted_shuffle",
          greatest(col("left_salts"), col("right_salts"))).otherwise(lit(1L)))
      .select(lit(label).as("rel"), col("left_rows"), col("right_rows"),
        col("left_keys"), col("right_keys"), col("left_skew"),
        col("right_skew"), col("strategy"), col("salts"))
  }
}
