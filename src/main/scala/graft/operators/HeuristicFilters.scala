package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** C4/Gopher-style heuristic quality gates — the standard pre-dedup stage
  * of an LLM training-data pipeline (C4: Raffel et al. 2020, §2.2; Gopher:
  * Rae et al. 2021, Appendix A1.1). Document-level gates are computed with
  * INTEGER arithmetic wherever they decide keep/drop (`10·n_sym <= n_words`
  * instead of `n_sym/n_words <= 0.1`), so both engines of the oracle
  * compare make bit-identical decisions with no float-boundary risk; the
  * only floats emitted are display columns rounded to 6 dp.
  *
  * Everything is `org.apache.spark.sql.functions` composition — one
  * projection, no UDFs, whole-stage codegen end to end; at corpus scale the
  * profile adds zero shuffles (it is a per-row map).
  */
object HeuristicFilters {

  /** Gopher's stop-word presence check uses a small English function-word
    * list; >= 2 distinct hits is the paper's gate. */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  val MinWords = 50
  val MaxWords = 100000
  val MinMeanWordLen = 3
  val MaxMeanWordLen = 10
  val MinStopHits = 2

  private def words(text: Column): Column =
    filter(TextFunctions.tokens(text), w => length(w) > 0)

  /** Per-document Gopher + C4 quality profile: token stats, each gate as
    * its own boolean column (observability — a funnel wants to know WHICH
    * gate dropped a doc), and the composite `keep`.
    *
    * Gates: word count in [50, 100k]; mean word length in [3, 10]; symbol
    * words (#, ellipsis) <= 10% of words; words containing an alphabetic
    * char >= 80%; >= 2 distinct stop words; C4 cleanliness (no
    * "lorem ipsum", no '{', no "javascript"). */
  def qualityProfile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lt = lower(col(textCol))
    val prof = docs
      .withColumn("__ws", words(col(textCol)))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("__sum_len",
        aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("__n_alpha",
        size(filter(col("__ws"), w => w.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("__n_sym",
        size(filter(col("__ws"), w =>
          instr(w, "#") > 0 || instr(w, "…") > 0 || instr(w, "...") > 0))
          .cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(col("__ws")),
          array(StopWords.map(lit): _*))).cast("long"))
      .withColumn("__c4_clean",
        instr(lt, "lorem ipsum") === 0 && instr(col(textCol), "{") === 0 &&
          instr(lt, "javascript") === 0)
    prof
      .withColumn("mean_word_len",
        when(col("n_words") > 0,
          round(col("__sum_len").cast("double") / col("n_words"), 6)))
      .withColumn("g_word_count",
        col("n_words") >= MinWords && col("n_words") <= MaxWords)
      .withColumn("g_word_len",
        col("__sum_len") >= lit(MinMeanWordLen) * col("n_words") &&
          col("__sum_len") <= lit(MaxMeanWordLen) * col("n_words"))
      .withColumn("g_symbol", lit(10L) * col("__n_sym") <= col("n_words"))
      .withColumn("g_alpha", lit(5L) * col("__n_alpha") >= lit(4L) * col("n_words"))
      .withColumn("g_stop", col("stop_hits") >= MinStopHits)
      .withColumn("g_c4", col("__c4_clean"))
      .withColumn("keep",
        col("g_word_count") && col("g_word_len") && col("g_symbol") &&
          col("g_alpha") && col("g_stop") && col("g_c4"))
      .drop("__ws", "__sum_len", "__n_alpha", "__n_sym", "__c4_clean")
  }

  /** The filter form most pipelines want: corpus rows passing every gate,
    * original columns unchanged. One per-row map, zero shuffles. */
  def qualityFilter(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val added = Seq("n_words", "mean_word_len", "stop_hits", "g_word_count",
      "g_word_len", "g_symbol", "g_alpha", "g_stop", "g_c4", "keep")
    qualityProfile(docs, idCol, textCol)
      .filter(col("keep"))
      .drop(added: _*)
  }

  /** C4's LINE-level cleaning: keep lines that end in terminal punctuation,
    * have at least `minLineWords` words, and carry no boilerplate marker
    * (javascript / cookie / privacy-policy / terms-of-use); dropped lines
    * vanish and survivors re-join with newlines. Returns the cleaned text
    * column (empty string when nothing survives).
    *
    * Per-row lambda composition over the line array — no explode/shuffle;
    * document order is preserved by `filter`'s element order. */
  def c4CleanLines(text: Column, minLineWords: Int = 3): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      val nw = size(filter(split(t, "\\s+"), w => length(w) > 0))
      t.rlike("[.!?\"”']$") && nw >= minLineWords &&
        !lower(t).rlike("javascript|cookie|privacy policy|terms of use")
    })
    array_join(kept, "\n")
  }
}
