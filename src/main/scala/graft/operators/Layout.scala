package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for multi-dimensional scan pruning at corpus scale.
  *
  * A 100 TB table is pruned file-by-file from parquet min/max footers; a
  * layout sorted on one column gives tight ranges on that column only. A
  * Z-order (Morton) layout interleaves the bits of several dimensions so a
  * range predicate on ANY of them maps to a bounded set of code ranges —
  * every file covers a small hyper-rectangle, and file-level min/max prunes
  * on all dimensions at once (the technique behind Delta/Iceberg Z-order
  * clustering).
  *
  * The code is computed with plain codegen'd bit arithmetic (shift/and/or on
  * longs — whole-stage-codegen friendly, no UDF), and the write path is
  * `repartitionByRange` on the code: Spark samples range boundaries, so the
  * clustering shuffle is fully parallel — no global sort bottleneck.
  */
object Layout {

  /** Morton (Z-order) code: interleave the low `bits` bits of each dimension,
    * dimension d owning bit positions d, d+n, d+2n, … Total bits must fit a
    * positive long. Dimensions must already be non-negative integers in
    * [0, 2^bits); see [[clampDim]]. */
  def mortonCode(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 1 && n * bits <= 62, s"need 1+ dims, n*bits <= 62; got n=$n bits=$bits")
    val terms = for {
      (c, d) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Clamp an arbitrary numeric column into the [0, 2^bits) domain a Morton
    * dimension needs (floor for fractionals, saturate at the edges). */
  def clampDim(c: Column, bits: Int): Column =
    greatest(lit(0L), least(floor(c).cast("long"), lit((1L << bits) - 1L)))

  /** Write `df` clustered by the Z-order of `dims`: range-partition on the
    * code (sampled boundaries — parallel, no single-task sort), sort within
    * each partition, one file per partition. Each output file then covers a
    * compact code range = a small hyper-rectangle of the dimension space. */
  def zorderWrite(df: DataFrame, path: String, dims: Seq[Column], bits: Int,
      numFiles: Int): Unit =
    df.withColumn("__z", mortonCode(dims, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of `statCols` for a parquet directory — the footer
    * stats a pruning scan consults, materialized for inspection/tests. */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame =
    df.withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(min(col(statCols.head)).as(s"min_${statCols.head}"),
        (Seq(max(col(statCols.head)).as(s"max_${statCols.head}")) ++
          statCols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)

  /** Compaction/write plan: for each partition of the output (e.g. per
    * source), how many files to write and how many rows per file so files
    * land near `targetBytes`. `bytes` is a per-row size proxy the caller
    * owns (uncompressed text length, serialized width — anything summable),
    * which keeps the plan engine-reproducible instead of depending on one
    * engine's private size estimate. One map-side-combined groupBy; the
    * plan is then executed with repartitionByRange(target_files) per group.
    * This is the small-files defense at 100 TB: a thousand executors
    * writing a partitioned table without a plan produce millions of
    * KB-sized files; with one, file count is bytes/targetBytes by design. */
  def compactionPlan(df: DataFrame, groupCols: Seq[String], bytes: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(bytes).cast("long").as("est_bytes"))
      .withColumn("target_files",
        greatest(lit(1L), ceil(col("est_bytes").cast("double") /
          lit(targetBytes.toDouble)).cast("long")))
      .withColumn("rows_per_file",
        ceil(col("n_rows").cast("double") /
          col("target_files").cast("double")).cast("long"))
      .withColumn("avg_row_bytes",
        round(col("est_bytes").cast("double") / col("n_rows").cast("double"), 6))
  }

  /** Range-partition split points for `value`: the n-1 interior quantiles
    * at i/n, i = 1..n-1 — what `repartitionByRange` estimates by sampling,
    * computed declaratively (one interpolated-percentile aggregate) so the
    * boundary choice is inspectable and engine-reproducible. One row per
    * boundary: (bucket upper-bounded by it, boundary value). */
  def rangeSplitPoints(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    require(n >= 2, "need at least 2 partitions")
    val ps = (1 until n).map(i => i.toDouble / n)
    df.agg(expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "boundary")))
      .select((col("i") + 1).cast("long").as("bucket"), col("boundary"))
  }

  /** Audit of the layout those split points produce: per-bucket row count.
    * Bucket of a row = number of boundaries strictly below its value (ties
    * go to the lower bucket). The n-1 boundaries collapse to ONE array row
    * cross-joined in (broadcast: no shuffle of `df`), bucket assignment is
    * a codegen'd array fold per row, and the only shuffle is the final
    * n-row count — the audit costs one scan, nothing next to the
    * repartitionByRange it validates. */
  def rangeBalance(df: DataFrame, value: Column, boundaries: DataFrame): DataFrame = {
    val arr = boundaries.agg(sort_array(collect_list(col("boundary"))).as("__bs"))
    df.select(value.as("__v")).crossJoin(broadcast(arr))
      .select(aggregate(col("__bs"), lit(0L),
        (acc, x) => acc + when(col("__v") > x, 1L).otherwise(0L)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
  }
}
