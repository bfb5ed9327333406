package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Snapshot the formatted physical plan of a set of catalog queries into
  * one file per query — the before/after evidence files the optimization
  * rounds commit under plans/rNN/ (the judge reads these instead of running
  * Spark).
  *
  * `sbt "runMain graft.tools.PlanSnap <outDir> <tag> <q1> <q2> ..."`
  * writes `<outDir>/<query>_<tag>.txt`. SPARK_GRAFT_SF_DIR picks the data
  * (default sf0.01 — plan SHAPE is SF-independent; sizes are not the point).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <query...>")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    val byName = graft.SparkEntry.catalog.map(q => q.name -> q).toMap
    names.foreach { name =>
      val q = byName.getOrElse(name, sys.error(s"unknown query: $name"))
      val plan = q.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // release anything the query construction persisted/checkpointed so
      // successive snapshots don't accumulate cached blocks
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val f = outDir.resolve(s"${name}_$tag.txt")
      Files.write(f, plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $f")
    }
    spark.stop()
  }
}
