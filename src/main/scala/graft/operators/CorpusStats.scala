package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level text profiling for training-data curation: per-document
  * n-gram repetition signals (the Gopher-family quality rules) and global
  * n-gram frequency rankings.
  *
  * Scale notes: both operators are built on ONE explode of the native
  * [[org.apache.spark.sql.graft.WordShingles]] kernel followed by hash
  * aggregations — partial (map-side) aggregation bounds shuffle bytes by the
  * number of DISTINCT (doc, gram) / gram keys per partition, not by corpus
  * token count, and the top-k ranking ends in TakeOrderedAndProject (k rows
  * per partition cross the wire, never a global sort).
  */
object CorpusStats {

  /** Per-document n-gram repetition profile: total and distinct n-gram
    * counts, the most-frequent gram's count, and the two derived fractions
    * used as repetition quality gates in large-scale corpus filtering
    * (documents dominated by one repeated phrase score high on both):
    *
    *   - `dup_gram_frac`  = 1 − distinct/total (0 when the doc has no grams)
    *   - `top_gram_frac`  = top/total           (0 when the doc has no grams)
    *
    * One explode feeds a (doc, gram) count, re-aggregated per doc — the
    * second aggregation's input is already one row per distinct (doc, gram),
    * so the expensive shuffle happens once, on partially-combined counts.
    * Documents with fewer than n tokens re-enter via a left join with
    * zero-valued defaults (their gram explode produces no rows at all).
    */
  def repetitionStats(
      docs: DataFrame,
      n: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perGram = docs
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val perDoc = perGram.groupBy(col(idCol)).agg(
      sum("cnt").as("n_grams"),
      count(lit(1)).as("n_distinct_grams"),
      max("cnt").as("top_gram_count"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_distinct_grams", coalesce(col("n_distinct_grams"), lit(0L)))
      .withColumn("top_gram_count", coalesce(col("top_gram_count"), lit(0L)))
      .withColumn("dup_gram_frac",
        round(when(col("n_grams") > 0,
          lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams"))
          .otherwise(0.0), 6))
      .withColumn("top_gram_frac",
        round(when(col("n_grams") > 0,
          col("top_gram_count").cast("double") / col("n_grams"))
          .otherwise(0.0), 6))
  }

  /** Global top-k n-grams by corpus frequency, ties broken by gram text so
    * the ranking is total and reproducible. The plan is the right 100 TB
    * shape: explode → partial-agg → one shuffle on gram → final agg →
    * TakeOrderedAndProject (each partition contributes at most k rows to the
    * driver-side merge; no global sort materializes). */
  def topNgrams(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 50,
      textCol: String = "text"): DataFrame =
    docs.select(explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("gram"))
      .limit(k)
}
