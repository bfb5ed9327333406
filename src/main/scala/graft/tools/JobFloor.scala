package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the per-job scheduling floor of THIS box right now: the
  * wall-clock of a trivially small two-stage (shuffled) job, min/p50/max
  * over 30 reps. The CC/PageRank loop families run 2-3 such latency-bound
  * jobs per round (join + agg + checkpoint), so their fixture-scale cost is
  * `rounds x jobs x floor` plus real work — when the floor inflates under
  * host contention, the loop queries inflate together while scan-bound
  * queries don't. Run this next to any "the CC family got slower" finding
  * before suspecting a plan regression (see PROFILING.md, round 11).
  */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobfloor")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def job(): Unit =
      spark.range(0, 1000000, 1, cpus.toInt)
        .repartition(cpus.toInt).selectExpr("sum(id)").collect(): Unit
    // the job-scale probe Bench's out-of-band gate runs (~128 MB through
    // hash + shuffle + aggregate): long enough to sample CPU-steal /
    // shuffle-disk / memory-bandwidth contention the tiny job can't see
    def bigJob(): Unit =
      spark.range(0, 8000000, 1, cpus.toInt)
        .selectExpr("id", "xxhash64(id) AS h")
        .repartition(cpus.toInt, org.apache.spark.sql.functions.col("h"))
        .selectExpr("bit_xor(h)").collect(): Unit
    (1 to 5).foreach { _ => job(); bigJob() } // warm codegen/JIT
    def series(f: () => Unit): Seq[Double] = (1 to 30).map { _ =>
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
    }.sorted
    val ms = series(job _)
    val bs = series(bigJob _)
    println(f"JOB_FLOOR_MS min=${ms.head}%.1f p50=${ms(ms.size / 2)}%.1f " +
      f"p90=${ms((ms.size * 9) / 10)}%.1f max=${ms.last}%.1f")
    println(f"JOB_SCALE_FLOOR_MS min=${bs.head}%.1f p50=${bs(bs.size / 2)}%.1f " +
      f"p90=${bs((bs.size * 9) / 10)}%.1f max=${bs.last}%.1f")
    spark.stop()
  }
}
