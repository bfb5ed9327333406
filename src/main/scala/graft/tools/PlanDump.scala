package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: the formatted physical plan of a representative
  * catalog slice, each with the scale property the plan must exhibit. Run
  * after any planner-visible change; the committed file is the review
  * artifact showing the plans are the ones we WANT, not just the ones that
  * passed. */
object PlanDump {
  private val picks: Seq[(String, String)] = Seq(
    "q02_filter_project" ->
      ("Scan-level pruning: the parquet scan must show PushedFilters for the " +
        "predicate and a ReadSchema limited to the projected columns — at " +
        "100 TB this is the difference between reading 2 columns and 16."),
    "q04_revenue_by_nation" ->
      ("Flagship 5-way join: the two large tables (orders x lineitem) meet " +
        "in a shuffled hash/sort-merge join on the key; every dimension " +
        "(customer/nation/region) arrives via BroadcastHashJoin. No " +
        "dimension may shuffle the fact table a second time."),
    "q21_gap_detection" ->
      ("Events sessionization: one Exchange on the session key feeding the " +
        "window — the sort and lag run inside the same partition; no " +
        "global (empty-key) window anywhere."),
    "q34_exact_dedup" ->
      ("Exact dedup: ONE shuffle on the content fingerprint (the groupBy); " +
        "the scan computes md5 map-side. Nothing corpus-sized is sorted " +
        "globally."),
    "q46_minhash_neardups" ->
      ("MinHash LSH: signatures are computed once (InMemoryTableScan of the " +
        "persisted signature table on both self-join sides), the band " +
        "explode shuffles only (id, band, bucket) rows, and the Jaccard " +
        "refinement semi-joins the candidate ids before any shingle " +
        "materialization."),
    "q53_ivf_knn" ->
      ("IVF ANN: the centroid table broadcasts (BroadcastHashJoin / " +
        "BroadcastNestedLoopJoin over <= 4096 rows); the corpus is probed " +
        "cell-bucketed — no all-pairs join of corpus x queries."),
    "q61_token_packing" ->
      ("Sharded packing: the running sum's Window partitions by the shard " +
        "key (Exchange hashpartitioning(shard)) — a global-order running " +
        "sum would be a single-partition window, the classic scale trap."),
    "q87_cms_heavy_hitters" ->
      ("CMS sketch: cell build is a map-side-combined HashAggregate over at " +
        "most d*w cells; the 20-row probe side broadcasts into the final " +
        "join."),
    "q106_token_chunking" ->
      ("Chunking: a pure map stage — sequence/explode/slice with NO " +
        "Exchange before the presentation sort (which drops at scale when " +
        "chunks stream to a writer)."),
    "q114_bigram_nll" ->
      ("Bigram LM: every join is vocabulary-keyed (w1/w2 hash joins); the " +
        "scalar token total arrives by broadcast; the only corpus-keyed " +
        "shuffle is the per-(doc, bigram) partial aggregate."))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val byName = graft.SparkEntry.catalog.map(q => q.name -> q).toMap
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the representative catalog slice\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.tools.PlanDump\"` after any\n")
    sb.append("planner-visible change. Each section states the scale property the\n")
    sb.append("plan must exhibit; the plan below it is the evidence. Plans are\n")
    sb.append(s"captured at sf0.001 with shuffle.partitions=8 (shapes, not sizes,\n")
    sb.append("are what carry to a 1000-executor cluster).\n")
    picks.foreach { case (name, why) =>
      val q = byName(name)
      val df = q.fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n")
      sb.append(s"**Must hold at scale:** $why\n\n")
      sb.append("```\n").append(plan.trim).append("\n```\n")
    }
    // Repo root from env or the forked JVM's working directory (sbt forks
    // in the project base directory) — not a hardcoded checkout path.
    val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO",
      sys.props.getOrElse("user.dir", "."))
    Files.write(Paths.get(s"$repoRoot/PLANS.md"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"$repoRoot/PLANS.md written (${picks.size} plans)")
    spark.stop()
  }
}
