package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ad-hoc stage decomposition for q47 (ensemble near-dups): times each
  * stage of the ensemble pipeline in isolation so perf work targets the
  * stage that actually dominates. Not part of the driver contract. */
object ProfileEnsemble {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    docs.select(count(lit(1))).collect()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val mh = time("minhashCandidates") {
        val c = Dedup.minhashCandidates(docs)
        c.count(); c
      }
      val sh = time("simhashCandidates+hamming (blocks=4)") {
        val c = Dedup.simhashCandidates(docs)
          .filter(col("hamming") <= 5)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
        c.count(); c
      }
      time("simhashTable fingerprints only") {
        Dedup.simhashTable(docs).count()
      }
      time("simhashCandidates blocks=7/match=2 maxHamming=5 (ensemble's)") {
        Dedup.simhashCandidates(docs, blocks = 7, matchBlocks = 2, maxHamming = 5)
          .select(col("id_a"), col("id_b"))
          .count()
      }
      val cands = time("union+distinct") {
        val c = mh.union(sh).distinct().localCheckpoint(true)
        c.count(); c
      }
      time("minhashNearDups (q46 proxy: cands+refine)") {
        Dedup.minhashNearDups(docs, threshold = 0.5).count()
      }
      time("full ensembleNearDups") {
        Dedup.ensembleNearDups(docs, threshold = 0.5).count()
      }
      time("ensemble variant: no proj cache, lazy refine") {
        val mh2 = Dedup.minhashCandidates(docs)
        val sh2 = Dedup.simhashCandidates(docs)
          .filter(col("hamming") <= 5)
          .select(col("id_a"), col("id_b"))
        val c2 = mh2.union(sh2).distinct().localCheckpoint(true)
        val ids = c2.select(col("id_a").as("sid"))
          .union(c2.select(col("id_b").as("sid")))
        val sh3 = docs
          .select(col("doc_id").as("sid"), col("text"))
          .join(ids, Seq("sid"), "left_semi")
          .select(col("sid"),
            graft.functions.TextFunctions.distinctShingles(col("text"), 3).as("sh"))
        c2.join(sh3.withColumnRenamed("sid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
          .join(sh3.withColumnRenamed("sid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
          .select(col("id_a"), col("id_b"),
            round(graft.functions.TextFunctions.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .count()
      }
      println(s"cands: mh=${mh.count()} sh=${sh.count()} union=${cands.count()}")
    }
    spark.stop()
  }
}
