package graft.operators

import graft.SparkSpec

/** The reliable-checkpoint mode (graft.loops.reliableCheckpoint) must be a
  * pure STORAGE decision: every iterative operator returns bit-identical
  * results with round frontiers on reliable checkpoint storage as with
  * localCheckpoint blocks — what makes the knob safe to flip on a cluster
  * where executor loss would kill a localCheckpoint'd loop mid-flight.
  *
  * Test ORDER matters: the missing-dir guard test must run before the
  * equality test, which is the only place in the whole suite that calls
  * SparkContext.setCheckpointDir (there is no unset API). ScalaTest runs
  * tests in declaration order within a suite. */
class LoopsSpec extends SparkSpec {
  import spark.implicits._

  test("reliable mode without a checkpoint dir fails loudly; default is off") {
    assert(!Loops.reliable(spark), "default must be localCheckpoint mode")
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "a checkpoint dir was already set on the shared context")
    spark.conf.set(Loops.ReliableConfKey, "true")
    try {
      val ex = intercept[IllegalStateException](Loops.reliable(spark))
      assert(ex.getMessage.contains(Loops.ReliableConfKey))
    } finally spark.conf.set(Loops.ReliableConfKey, "false")
  }

  test("iterative operators return identical results in both modes") {
    // graph: two triangles + bridge + tendril (exercises peel, LPA, ranks)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L)).toDF("src", "dst")
    val weighted = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 3L),
      (2L, 1L, 1L)).toDF("src", "dst", "cnt")
    // CC pairs: two components {10,11,12} and {20,21}
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")

    def run(): (Set[(Long, Long)], Set[(Long, Long)], Set[(Long, Long)], Set[(Long, Long)]) = (
      Graph.labelPropagation(edges, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      Graph.kCore(edges, k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      Graph.pageRankFixedPoint(weighted, iters = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      Dedup.nearDupClusters(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-loops-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Loops.ReliableConfKey, "true")
    val reliableResults =
      try {
        val got = run()
        // prove the reliable path actually ran: round frontiers on disk
        val d = new java.io.File(
          new java.net.URI(spark.sparkContext.getCheckpointDir.get))
        assert(d.exists && d.listFiles.nonEmpty,
          "reliable mode must write round frontiers to the checkpoint dir")
        got
      } finally spark.conf.set(Loops.ReliableConfKey, "false")
    assert(reliableResults === local)
  }
}
