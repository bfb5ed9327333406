package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned probe is a superset of true matches — zero false negatives") {
    val build = (0L until 200L by 2L).toDF("key") // evens < 200
    val probe = (0L until 2000L).toDF("key")
    val bits = BloomJoin.buildBits(build, $"key")
    val pruned = BloomJoin.prune(probe, $"key", bits)
      .collect().map(_.getLong(0)).toSet
    val truth = (0L until 200L by 2L).toSet
    assert(truth.subsetOf(pruned), "bloom dropped a true match")
    // and it actually prunes: 100 true keys out of 2000, fp rate at
    // n=100,m=16384,k=3 is ~2e-5 — far fewer than half survive
    assert(pruned.size < 1000, s"no real pruning: ${pruned.size} of 2000")
  }

  test("bit frame is bounded by min(k*n, m) and dedupes") {
    val n = BloomJoin.buildBits((1L to 50L).toDF("key"), $"key").count()
    assert(n <= 150)
    val big = BloomJoin.buildBits((1L to 100000L).toDF("key"), $"key",
      m = 512, k = 3).count()
    assert(big <= 512, "bit positions must live in [0, m)")
  }

  test("probe side never shuffles: k broadcast semi joins, zero exchanges on the probe path") {
    // pre-materialize the filter (the deployment shape: built once,
    // persisted, reused) so the plan under audit is exactly the probe pass
    val build = (0L until 100L).toDF("key")
    val bits = BloomJoin.buildBits(build, $"key")
      .as[Long].collect().toSeq.toDF("bit")
    val probe = (0L until 5000L).toDF("key")
    val pruned = BloomJoin.prune(probe, $"key", bits)
    val plan = pruned.queryExecution.executedPlan.toString
    val semiJoins = "BroadcastHashJoin .*LeftSemi".r.findAllIn(plan).size
    assert(semiJoins === 3, s"expected 3 broadcast semi joins, plan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe path must be map-only, plan:\n$plan")
  }

  test("empty build side prunes everything") {
    val bits = BloomJoin.buildBits(
      Seq.empty[Long].toDF("key"), $"key")
    val out = BloomJoin.prune((1L to 100L).toDF("key"), $"key", bits)
    assert(out.count() === 0L)
  }
}
