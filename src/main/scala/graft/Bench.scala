package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query median seconds over `reps` runs.
  *
  * Full evaluation is forced by writing to the `noop` datasource — a plain
  * `count()` would let Catalyst prune projections/sorts and time fiction
  * (a map-only string query "runs" in 0.1s because only parquet row counts
  * are read). A warm-up query absorbs session/codegen startup so the first
  * catalog entry isn't charged ~4s of JVM warm-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def evalFully(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up: flagship join once (fills codegen/parquet-footer/JIT caches).
    try SparkEntry.queries("q04_revenue_by_nation")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Optional comma-separated name filter for iterating on one query
    // locally; the driver never sets it, so official runs time everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      // Per-query untimed warm-up: the first evaluation of the wide-agg
      // pipelines pays ~10 s of one-time janino codegen compilation, which
      // is JVM-lifetime cost, not query cost — medians measure the steady
      // state a long-lived session (or any real deployment) runs at.
      evalFully(name)
      val raw = (1 to reps).map(_ => evalFully(name))
      // SPARK_GRAFT_BENCH_VERBOSE=1: per-rep times to stderr, for spotting
      // session-age drift (a growing sequence means accumulated state —
      // storage blocks, codegen caches — not query cost)
      if (sys.env.get("SPARK_GRAFT_BENCH_VERBOSE").contains("1"))
        System.err.println(s"BENCH_REPS $name " +
          raw.map(t => f"$t%.2f").mkString(" "))
      val times = raw.filter(_ >= 0.0).sorted
      val median = if (times.isEmpty) -1.0 else times(times.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0.0).sum
    // A filtered run's "total" covers only the selected queries — mark it so
    // it can't be mistaken for a full-suite figure.
    val filtered = if (only.isDefined) ""","filtered":true""" else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$filtered,"sf":"$sfDir"}""")
    spark.stop()
  }
}
