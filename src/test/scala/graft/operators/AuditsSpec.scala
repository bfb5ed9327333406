package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AuditsSpec extends SparkSpec {
  import spark.implicits._

  test("rowChecks: planted violations fire with exact counts, one row per check") {
    val df = Seq((1L, 10.0), (2L, -3.0), (3L, 0.0), (4L, -1.0)).toDF("id", "v")
    val got = Audits.rowChecks(df, "t", Seq(
        "neg_v" -> ($"v" < 0), "zero_v" -> ($"v" === 0)))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got === Map("neg_v" -> ((2L, 4L, 0.5)), "zero_v" -> ((1L, 4L, 0.25))))
  }

  test("rowChecks folds all checks into ONE scan (single aggregate, no union)") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val plan = Audits.rowChecks(df, "t", Seq(
        "a" -> ($"v" < 0), "b" -> ($"v" === 0), "c" -> ($"v" > 9)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"k checks must not fan into k scans:\n$plan")
  }

  test("fkOrphans counts children without parents; clean data reads zero") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val bad = Audits.fkOrphans(child, "fk", parent, "pk", "child", "orphans")
      .collect().head
    assert(bad.getLong(2) === 1L && bad.getLong(3) === 3L)
    val clean = Audits.fkOrphans(child.filter($"fk" === 10L), "fk", parent,
      "pk", "child", "orphans").collect().head
    assert(clean.getLong(2) === 0L)
  }

  test("dupKeys: duplicated keys counted once each, denominator is distinct keys") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val r = Audits.dupKeys(df, "k", "t", "dups").collect().head
    assert(r.getLong(2) === 2L, "keys 1 and 3 are duplicated")
    assert(r.getLong(3) === 3L, "three distinct keys")
  }
}
