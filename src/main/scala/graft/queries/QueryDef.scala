package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark-first implementation plus, when the semantics
  * are ANSI-SQL-expressible, the DuckDB oracle the driver cross-checks.
  *
  * Determinism contract (both sides): every query ends in a total ORDER BY;
  * every computed column is aliased identically in Spark and SQL; float
  * aggregates either go through exact decimal arithmetic or are rounded at or
  * above the data's intrinsic decimal precision so both engines land on the
  * same grid point regardless of summation order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(spark, dir, name)
}
