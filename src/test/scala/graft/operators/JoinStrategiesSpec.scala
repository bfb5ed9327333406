package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class JoinStrategiesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join and spreads the hot key over salts") {
    val orders = Tables(spark, sf0001, "orders")
    val customer = Tables(spark, sf0001, "customer")
      .select($"c_custkey", $"c_name")
    val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name")
    val salted = JoinStrategies.saltedJoin(
      orders.withColumn("c_custkey", $"o_custkey"), customer,
      key = "c_custkey", rowKey = "o_orderkey", salts = 8)
      .select($"o_orderkey", $"c_name")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // the hot-key spread: salts actually take multiple values per key
    val saltsSeen = Tables(spark, sf0001, "orders")
      .withColumn("__salt", pmod(xxhash64($"o_orderkey"), lit(8)))
      .select(countDistinct($"__salt")).head.getLong(0)
    assert(saltsSeen === 8L)
  }

  test("bucketed tables join with NO shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      JoinStrategies.writeBucketed(
        Tables(spark, sf0001, "orders").select($"o_orderkey", $"o_custkey", $"o_totalprice"),
        "orders_bkt", "o_custkey", buckets = 4)
      JoinStrategies.writeBucketed(
        Tables(spark, sf0001, "customer").select($"c_custkey".as("o_custkey"), $"c_name"),
        "customer_bkt", "o_custkey", buckets = 4)
      val joined = JoinStrategies.bucketedJoin(spark, "orders_bkt", "customer_bkt", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join, got:\n$plan")
      assert(joined.count() === Tables(spark, sf0001, "orders").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("skewProfile: balanced key recommends 1 salt, hot key recommends ceil(skew)") {
    // balanced: 10 keys x 10 rows each → skew_ratio 1.0, salts 1
    val balanced = (0 until 100).map(i => (i.toLong, i % 10)).toDF("id", "k")
    val b = JoinStrategies.skewProfile(balanced, "k", "balanced").collect().head
    assert(b.getAs[Long]("n_rows") === 100L)
    assert(b.getAs[Long]("n_keys") === 10L)
    assert(b.getAs[Double]("skew_ratio") === 1.0)
    assert(b.getAs[Long]("recommended_salts") === 1L)

    // hot: one key holds 91 of 100 rows over 10 keys → skew 9.1 → 10 salts
    val hot = ((1 to 91).map(i => (i.toLong, 0)) ++
      (92 to 100).map(i => (i.toLong, i % 9 + 1))).toDF("id", "k")
    val h = JoinStrategies.skewProfile(hot, "k", "hot").collect().head
    assert(h.getAs[Long]("max_cnt") === 91L)
    assert(h.getAs[Double]("skew_ratio") === 9.1)
    assert(h.getAs[Long]("recommended_salts") === 10L)

    // the cap: 999 rows on one key + 99 singleton keys → skew ~91, capped 32
    val extreme = ((1 to 999).map(i => (i.toLong, 0)) ++
      (1 to 99).map(i => (1000L + i, i))).toDF("id", "k")
    val s = JoinStrategies.skewProfile(extreme, "k", "extreme", maxSalts = 32)
      .collect().head
    assert(s.getAs[Double]("skew_ratio") > 32.0)
    assert(s.getAs[Long]("recommended_salts") === 32L)
  }

  test("adviseJoin picks broadcast / salted / shuffle by the stated rules") {
    val big = (1 to 2000).map(i => (i.toLong, i % 100)).toDF("id", "k")
    val small = (1 to 50).map(i => (i.toLong, i % 50)).toDF("id", "k")
    val hot = ((1 to 1800).map(i => (i.toLong, 0)) ++
      (1 to 200).map(i => (2000L + i, i % 99 + 1))).toDF("id", "k")

    // rule 1: the smaller side fits the budget → broadcast it
    val b = JoinStrategies.adviseJoin(big, "k", small, "k", "b",
      broadcastRows = 100L).collect().head
    assert(b.getAs[String]("strategy") === "broadcast_right")
    assert(b.getAs[Long]("salts") === 1L)
    val bl = JoinStrategies.adviseJoin(small, "k", big, "k", "bl",
      broadcastRows = 100L).collect().head
    assert(bl.getAs[String]("strategy") === "broadcast_left")

    // rule 2: no broadcast fit, skew past threshold → salted with the
    // bigger side's salt recommendation
    val sa = JoinStrategies.adviseJoin(hot, "k", big, "k", "sa",
      broadcastRows = 10L, skewThreshold = 4.0).collect().head
    assert(sa.getAs[String]("strategy") === "salted_shuffle")
    assert(sa.getAs[Long]("salts") > 1L)

    // rule 3: neither → plain shuffle
    val sh = JoinStrategies.adviseJoin(big, "k", big, "k", "sh",
      broadcastRows = 10L, skewThreshold = 4.0).collect().head
    assert(sh.getAs[String]("strategy") === "shuffle")
    assert(sh.getAs[Long]("salts") === 1L)
  }

  test("identical aggregation subplans share ONE exchange (ReusedExchange)") {
    // agg joined with a reduction of itself: the o_custkey exchange must be
    // planned once and reused, not shuffled twice — the pattern behind
    // "compare each group to the global extreme" queries at 100 TB
    // AQE finalizes reuse at runtime (stage-level); disable it so the
    // static planner's ReuseExchange rule is visible in the plan text
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = Tables(spark, sf0001, "orders")
      val agg = orders.groupBy($"o_custkey").agg(sum($"o_totalprice").as("rev"))
      val joined = agg.crossJoin(broadcast(agg.agg(max($"rev").as("mx"))))
        .withColumn("share", $"rev" / $"mx")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"expected the aggregation exchange to be reused, got:\n$plan")
      assert(joined.count() === agg.count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
