package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Decontamination, Dedup, Sampling}
import graft.sources.Tables

/** Stage decomposition of q72_full_pipeline (r16 verdict weak #2: committed
  * median 2.45x best-ever with GC-heavy reps). Times each funnel stage in
  * isolation (forced via noop write), twice, printing min wall + GC delta —
  * names WHERE a slow q72 rep spends its time, so "the full pipeline is
  * slow" decomposes into a stage fact.
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileQ72"`
  */
object ProfileQ72 {
  private def gcMillis(): Long = {
    var t = 0L
    val it =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
    while (it.hasNext) { val g = it.next().getCollectionTime; if (g > 0) t += g }
    t
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def dropPersisted(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))

    def time(label: String)(mk: () => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        dropPersisted(); System.gc()
        val gc0 = gcMillis(); val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, gcMillis() - gc0)
      }
      val (sec, gc) = times.minBy(_._1)
      println(f"STAGE $label%-28s ${sec}%6.2f s  gc ${gc}%4d ms")
    }

    val docs = Tables(spark, sfDir, "documents")
    // warm-up: whole pipeline once (codegen/JIT), matching Bench discipline
    graft.SparkEntry.queries("q72_full_pipeline")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    dropPersisted()

    def clean() = Decontamination.clean(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0))
    def gated() = clean().select($"doc_id", $"text",
        TextFunctions.langId($"text").as("lang_pred"),
        TextFunctions.qualityScore($"text").as("quality"))
      .filter($"lang_pred" =!= "unknown" && $"quality" >= 0.4)
    def pairs() = Dedup.minhashNearDups(gated(), threshold = 0.5)
    def clusters() = Dedup.nearDupClusters(pairs())

    time("decontam_clean")(() => clean())
    time("gated(lang+quality)")(() => gated())
    time("minhash_pairs(gated)")(() => pairs())
    time("cc_clusters(pairs)")(() => clusters())
    time("full_q72")(() =>
      graft.SparkEntry.queries("q72_full_pipeline")(spark, sfDir))
    spark.stop()
  }
}
