package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the TPC-H-ish fixtures (see TESTDATA.md).
  *
  * All reads go through here so scan-level concerns (schema quirks, nanosecond
  * timestamps, future partitioning/bucketing) live in one place. Scans stay
  * fully declarative so Catalyst pushes filters/projections into the parquet
  * reader (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects outright. Read the raw int64 nanos and truncate to microsecond
      // precision — the same truncation DuckDB applies casting
      // TIMESTAMP_NS -> TIMESTAMP, so oracle comparisons stay exact.
      // Integral division (`div`) is mandatory: Column `/` is double division
      // and doubles cannot represent epoch-nanos exactly.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case n => spark.read.parquet(s"$dir/$n.parquet")
  }
}
