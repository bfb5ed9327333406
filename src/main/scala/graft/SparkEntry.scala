package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Events, QueryDef, Relational, Reshape, Sketch, Text, Vectors}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-domain modules; every entry is a
  * Spark-first declarative plan and, when SQL-expressible, carries a DuckDB
  * oracle with identical column names, ordering, and numeric-determinism
  * treatment (see queries.QueryDef).
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    Relational.defs ++ Events.defs ++ Text.defs ++ Vectors.defs ++
      Sketch.defs ++ Reshape.defs ++ Analytics.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way join: shuffle join of the two large tables, broadcasts for
    * the dimensions — the plan shape that must hold at 100 TB. */
  def entry(spark: SparkSession): DataFrame =
    catalog.find(_.name == "q04_revenue_by_nation").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (xxhash64-based MinHash/SimHash/LSH) → driver records rows-only. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql.replaceAll("\\s+", " ").trim))
      .toMap
}
