package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over corpus tables — the dbt-test / deequ
  * shape, declaratively, with the scan budget a 100 TB table demands:
  * every row-level check on a table folds into ONE aggregate over ONE
  * scan (a count_if per check), referential checks are single anti-join
  * aggregates, and the result is a uniform (tbl, check, n_bad, n_total,
  * bad_frac) frame a gate can alert on. Running k checks must never cost
  * k scans.
  */
object Audits {

  /** All row-level checks for one table in one scan: `checks` maps check
    * name -> "row is BAD" predicate; each becomes a count_if in a single
    * aggregate, unpivoted to one row per check. */
  def rowChecks(df: DataFrame, table: String,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).cast("long").as("__n") +:
      checks.map { case (name, bad) =>
        count_if(bad).cast("long").as(s"__c_$name") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (name, _) => s"'$name', __c_$name" }
      .mkString(", ")
    one.select(lit(table).as("tbl"),
        expr(s"stack(${checks.size}, $stacked) AS (chk, n_bad)"),
        col("__n").as("n_total"))
      .select(col("tbl"), col("chk"), col("n_bad"), col("n_total"),
        round(col("n_bad").cast("double") / col("n_total").cast("double"), 6)
          .as("bad_frac"))
  }

  /** Referential-integrity check: child rows whose `childKey` has no match
    * in `parent.parentKey`. One anti-join (semi-join complement) — at
    * scale the parent key set is the broadcast/bloom side, never the
    * child. Emitted in the same shape as [[rowChecks]]. */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, table: String, check: String): DataFrame = {
    val total = child.agg(count(lit(1)).cast("long").as("n_total"))
    val bad = child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_bad"))
    bad.crossJoin(total)
      .select(lit(table).as("tbl"), lit(check).as("chk"), col("n_bad"),
        col("n_total"),
        round(col("n_bad").cast("double") / col("n_total").cast("double"), 6)
          .as("bad_frac"))
  }

  /** Primary-key uniqueness: keys carried by more than one row. n_total is
    * the DISTINCT key count (the denominator a uniqueness claim is over).
    * One keyed count — map-side combined. */
  def dupKeys(df: DataFrame, key: String, table: String,
      check: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .agg(count_if(col("__cnt") > 1).cast("long").as("n_bad"),
        count(lit(1)).cast("long").as("n_total"))
      .select(lit(table).as("tbl"), lit(check).as("chk"), col("n_bad"),
        col("n_total"),
        round(col("n_bad").cast("double") / col("n_total").cast("double"), 6)
          .as("bad_frac"))
}
