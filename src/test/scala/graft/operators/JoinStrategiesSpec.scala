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
}
