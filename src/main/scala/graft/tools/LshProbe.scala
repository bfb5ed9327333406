package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the ScaleRamp lsh_knn tail: is the 10x growth
  * under-planing (fixable by more hyperplanes) or cluster skew (inherent
  * to data-blind LSH on clustered corpora)? Prints per-plane-count bucket
  * occupancy (max/p99 bucket) and the candidate-pair count the kNN join
  * would generate against the ramp's 256-query probe set.
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.LshProbe"`
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lsh-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = ScaleRamp.scaledVecs(spark, sfDir, 10).localCheckpoint(true)
    val queries = graft.sources.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 37 === 0).limit(256).localCheckpoint(true)
    val n = corpus.count()
    val d = corpus.select(size(col("embedding"))).head.getInt(0)
    println(s"PROBE corpus=$n dim=$d")

    import graft.functions.VectorFunctions.lshBucket
    def buckets(df: org.apache.spark.sql.DataFrame, planes: Int) =
      df.select((0 until 4).map(t =>
          lshBucket(col("embedding"), planes, d, t).as(s"__b$t")): _*)
        .select(explode(array((0 until 4).map(t =>
          struct(lit(t).as("tbl"), col(s"__b$t").as("bucket"))): _*)).as("tb"))
        .select(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    Seq(9, 12, 16).foreach { planes =>
      val occ = buckets(corpus, planes).groupBy("tbl", "bucket")
        .agg(count(lit(1)).as("n"))
      val stats = occ.agg(max("n").as("mx"),
        expr("percentile(n, 0.99)").as("p99"), count(lit(1)).as("nb")).head
      val qb = buckets(queries, planes).groupBy("tbl", "bucket")
        .agg(count(lit(1)).as("nq"))
      val cand = occ.join(qb, Seq("tbl", "bucket"))
        .agg(sum(col("n") * col("nq"))).head.getLong(0)
      println(f"PROBE planes=$planes%-3d buckets_used=${stats.getLong(2)}%-6d max_bucket=${stats.getLong(0)}%-6d p99_bucket=${stats.getDouble(1)}%.0f candidates=$cand")
    }

    // Stage timing of the full join at the ramp's factor-10 shape: where
    // do the 4 seconds actually go?
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE_T $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def bucketsT(df: org.apache.spark.sql.DataFrame, planes: Int, tables: Int) =
      df.select((0 until tables).map(t =>
        graft.functions.VectorFunctions.lshBucket(col("embedding"), planes, d, t)
          .as(s"__b$t")): _*)
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { r =>
      timed(s"planes5_tables1_r$r") {
        bucketsT(corpus, 5, 1).write.format("noop").mode("overwrite").save()
      }
      timed(s"planes9_tables1_r$r") {
        bucketsT(corpus, 9, 1).write.format("noop").mode("overwrite").save()
      }
      timed(s"planes9_tables4_r$r") {
        bucketsT(corpus, 9, 4).write.format("noop").mode("overwrite").save()
      }
      timed(s"planes5_tables4_r$r") {
        bucketsT(corpus, 5, 4).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
