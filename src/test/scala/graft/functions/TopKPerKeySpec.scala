package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExtensions, TopKPerKey, TopKPerKeyExec}

import graft.SparkSpec
import graft.sources.Tables

/** The custom per-group top-k operator (logical node + strategy + two-phase
  * heap exec) must return exactly the window-idiom rows, with a plan that
  * sorts nothing and shuffles at most k rows per key per partition. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def topK(df: org.apache.spark.sql.DataFrame,
      keys: Seq[org.apache.spark.sql.Column],
      order: Seq[org.apache.spark.sql.Column], k: Int) = {
    GraftExtensions.registerInto(spark)
    TopKPerKey(df, keys, order, k)
  }

  test("hand-computed: top-2 per key with a descending order and tiebreak") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 1.0),
      ("c", 6L, 5.0), ("c", 7L, 5.0), ("c", 8L, 5.0)
    ).toDF("k", "id", "v")
    val got = topK(df, Seq($"k"), Seq($"v".desc, $"id".asc), 2)
      .select($"k", $"id").as[(String, Long)].collect().toSet
    // a: v=30 ties -> ids 2,4; b: only row; c: v ties -> lowest ids 6,7
    assert(got === Set(("a", 2L), ("a", 4L), ("b", 5L), ("c", 6L), ("c", 7L)))
  }

  test("parity with the window row_number idiom on the orders fixture") {
    val orders = Tables(spark, sf001, "orders")
    val k = 3
    val viaOperator = topK(orders, Seq($"o_orderpriority"),
        Seq($"o_totalprice".desc, $"o_orderkey".asc), k)
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().toSet
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().toSet
    assert(viaOperator === viaWindow)
    assert(viaOperator.nonEmpty)
  }

  /** executedPlan with the AQE wrapper looked through (AdaptiveSparkPlan
    * does not expose its inner plan as a child for collect). */
  private def innerPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("plan: two heap phases around one exchange, no Sort, no Window") {
    val orders = Tables(spark, sf001, "orders")
    val df = topK(orders, Seq($"o_orderpriority"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
    val plan = innerPlan(df)
    val execs = plan.collect { case e: TopKPerKeyExec => e }
    assert(execs.map(_.partial).sorted === Seq(false, true),
      s"expected partial + final phases:\n$plan")
    val s = plan.toString
    assert(s.contains("Exchange"), s"final phase must cluster on the keys:\n$s")
    assert(!s.contains("Sort "), s"top-k must not sort partitions:\n$s")
    assert(!s.contains("Window"), s"top-k must not plan a window:\n$s")
  }

  test("map-side reduction: the exchange carries at most keys*k rows per partition") {
    // 4 input partitions x 1000 rows, 2 keys: the partial phase must cut
    // each partition to <= 2 keys x 3 rows before the shuffle
    val big = spark.range(0, 4000, 1, 4)
      .select(($"id" % 2).as("k"), $"id", rand(7).as("v"))
    val df = topK(big, Seq($"k"), Seq($"v".desc, $"id".asc), 3)
    val partialOut = innerPlan(df)
      .collect { case e: TopKPerKeyExec if e.partial => e }
      .head.execute().mapPartitions(it => Iterator(it.size)).collect()
    assert(partialOut.length === 4 && partialOut.forall(_ <= 2 * 3),
      s"partial phase must bound per-partition output: ${partialOut.toSeq}")
    assert(df.count() === 6)
  }

  test("k larger than any group degrades to identity (all rows survive)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "id")
    assert(topK(df, Seq($"k"), Seq($"id".asc), 100).count() === 3)
  }

  test("RewriteRankFilter shape 1: filter(rn<=k).drop(rn) becomes TopKPerKey") {
    GraftExtensions.registerInto(spark)
    val orders = Tables(spark, sf001, "orders")
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val idiom = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"o_orderkey")
    val optimized = idiom.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerKey"),
      s"rank-filter idiom must rewrite:\n$optimized")
    // both the Window AND Spark's own InferWindowGroupLimit prefilter must
    // go (the operator's partial phase subsumes the group limit)
    assert(!optimized.contains("Window"),
      s"Window and WindowGroupLimit must disappear:\n$optimized")
    // identical rows to the un-rewritten window form
    val viaOperator = idiom.as[(String, Long)].collect().toSet
    val viaWindow = {
      val prev = spark.experimental.extraOptimizations
      try {
        spark.experimental.extraOptimizations =
          prev.filterNot(_ == org.apache.spark.sql.graft.RewriteRankFilter)
        orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
          .select($"o_orderpriority", $"o_orderkey")
          .as[(String, Long)].collect().toSet
      } finally spark.experimental.extraOptimizations = prev
    }
    assert(viaOperator === viaWindow && viaOperator.nonEmpty)
  }

  test("RewriteRankFilter shape 2: bare filter(rn===1) keeps rn as literal 1") {
    GraftExtensions.registerInto(spark)
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
      .toDF("k", "id", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val top1 = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val optimized = top1.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerKey") && !optimized.contains("Window"),
      s"top-1 filter must rewrite:\n$optimized")
    val got = top1.select($"k", $"id", $"rn").as[(String, Long, Int)]
      .collect().toSet
    assert(got === Set(("a", 2L, 1), ("b", 3L, 1)),
      "rank column must survive as the constant 1")
  }

  test("RewriteRankFilter leaves non-matching windows alone") {
    GraftExtensions.registerInto(spark)
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0)).toDF("k", "id", "v")
    // rank() is not row_number; global (no partition) row_number; rn kept
    // in the output with k > 1 — none may rewrite
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val rankFn = df.withColumn("rn", rank().over(w)).filter($"rn" <= 1)
      .select($"k", $"id")
    assert(!rankFn.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    val globalW = Window.orderBy($"v".desc, $"id".asc)
    val global = df.withColumn("rn", row_number().over(globalW))
      .filter($"rn" <= 1).select($"k")
    assert(!global.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    val rnKept = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(!rnKept.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      "k>1 with the rank still in scope cannot drop the Window")
  }
}
