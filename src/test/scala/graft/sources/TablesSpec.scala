package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Scan-contract guard for the events fixture.
  *
  * The `ts` column's parquet encoding has changed under our feet twice
  * (TIMESTAMP(NANOS) read as raw int64 under Spark ≤4.0 legacy conf;
  * TIMESTAMP_NTZ micros under Spark 4.1 / regenerated fixtures). Every
  * events-backed query depends on `Tables` normalizing that to a session-UTC
  * TimestampType with identical instants, so pin the contract here: if a
  * future Spark or fixture change breaks the scan again, THIS spec fails
  * first with a precise message, instead of 21 catalog queries going dark.
  */
class TablesSpec extends SparkSpec {

  test("events.ts scans as TimestampType with pinned instants (UTC)") {
    val events = Tables(spark, sf0001, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${events.schema("ts").dataType}")
    val row = events.agg(
      count(lit(1)).as("n"),
      date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("lo"),
      date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("hi")).head()
    assert(row.getLong(0) == 1000L, s"row count drifted: ${row.getLong(0)}")
    assert(row.getString(1) == "2024-01-01 00:09:58.778549",
      s"min(ts) drifted: ${row.getString(1)}")
    assert(row.getString(2) == "2024-01-30 23:26:16.220708",
      s"max(ts) drifted: ${row.getString(2)}")
  }

  test("all fixture tables scan") {
    Tables.all.foreach { name =>
      val df = Tables(spark, sf0001, name)
      assert(df.columns.nonEmpty, s"$name: empty schema")
    }
  }
}
