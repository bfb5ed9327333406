package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Catalog-wide contract: every query runs on sf0.001, returns rows, and
  * (the driver's hashing requirement) every oracle references only columns
  * the Spark result actually produces. Value-level equivalence is covered by
  * the DuckDB gate (tools/check_oracle.py). */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and well-formed") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct == names)
    assert(names.forall(_.matches("q[0-9]{2,3}_[a-z0-9_]+")))
  }

  for (q <- SparkEntry.catalog) {
    test(s"${q.name} executes on sf0.001 with rows > 0") {
      val df = q.fn(spark, sf0001)
      assert(df.count() > 0)
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct (A4) stays within 5% of exact at fixture scale") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, sf001, "lineitem")
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
