package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Recall/latency grid for the ANN operating points: every published
  * `ann_recall` number needs its cost measured alongside (a recall column
  * without a cost column is marketing). Run:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AnnTune"
  *
  * Prints one line per operating point: recall@k vs the exact kNN truth,
  * wall seconds for the full |Q|-query join (median of 3), and the scan
  * fraction the index touches (candidates / (|Q| * n) — the scale-relevant
  * cost; wall time at sf0.1 is dominated by fixed plan overhead).
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = 10
    val nQ = 50
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < nQ)
    val n = emb.count()

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.knnJoin(emb, queries, k))
    def recall(s: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 0.0 else (s & exact).size.toDouble / exact.size

    def timeIt(mk: () => DataFrame): (Double, Double) = {
      val r = recall(pairs(mk()))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (r, times.min)
    }

    val cells = math.min(Similarity.DefaultMaxCentroids,
      math.max(2, math.ceil(n.toDouble / 64).toInt))
    println(s"n=$n cells=$cells k=$k nQ=$nQ")

    for (iters <- Seq(2, 5); probe <- Seq(8, 12, 16)) {
      val cents = Similarity.ivfCentroidsTrained(emb, cells, iterations = iters)
      val (r, t) = timeIt(() =>
        Similarity.ivfKnnJoin(emb, queries, k, nProbe = probe, centroids = cents))
      println(f"ivf iters=$iters%d nProbe=$probe%-2d recall=$r%.3f minSec=$t%.2f scanFrac=${probe.toDouble / cells}%.3f")
    }
    for (tables <- Seq(2, 4, 6); probes <- Seq(8, 16)) {
      val (r, t) = timeIt(() =>
        Similarity.lshKnnJoin(emb, queries, k, tables = tables, probes = probes))
      println(f"lsh tables=$tables%d probes=$probes%-2d recall=$r%.3f minSec=$t%.2f")
    }
    for (m <- Seq(8, 16); pool <- Seq(64, 128, 192)) {
      val mdl = Similarity.trainIvfPq(emb, nCentroids = cells, m = m, coarseIterations = 5)
      val (r, t) = timeIt(() =>
        Similarity.ivfPqKnnJoin(emb, queries, k, model = mdl, nProbe = 16, rerank = pool))
      println(f"ivfpq m=$m%-2d nProbe=16 rerank=$pool%-3d recall=$r%.3f minSec=$t%.2f")
    }
    // PCA-rotated basis with per-m balanced eigenvalue allocation
    // (OPQ-lite, q194): same budgets as the rows above — the recall delta
    // is pure subquantizer decorrelation/balancing gain
    val wm = Similarity.fitWhitening(emb)
    for (m <- Seq(8, 16); pool <- Seq(64, 128, 192)) {
      val rotEmb = Similarity.rotateForAnn(emb, wm, m = m)
      val rotQ = Similarity.rotateForAnn(queries, wm, m = m)
      val mdl = Similarity.trainIvfPq(rotEmb, nCentroids = cells, m = m, coarseIterations = 5)
      val (r, t) = timeIt(() =>
        Similarity.ivfPqKnnJoin(rotEmb, rotQ, k, model = mdl, nProbe = 16, rerank = pool))
      println(f"ivfpq_rot m=$m%-2d nProbe=16 rerank=$pool%-3d recall=$r%.3f minSec=$t%.2f")
    }
    spark.stop()
  }
}
