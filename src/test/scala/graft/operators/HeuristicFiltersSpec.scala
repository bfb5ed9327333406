package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeuristicFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  private val fiftyGood =
    (Seq("the", "a") ++ Seq.fill(48)("word")).mkString(" ") // 50 words, stops, alpha

  private lazy val docs = Seq(
    doc(0, fiftyGood),                                    // passes every gate
    doc(1, "the a short doc"),                            // fails word count
    doc(2, (Seq("the", "a") ++ Seq.fill(48)("antidisestablishmentarianism")).mkString(" ")), // mean len > 10
    doc(3, (Seq("the", "a") ++ Seq.fill(40)("ok") ++ Seq.fill(8)("##")).mkString(" ")), // >10% symbol words
    doc(4, (Seq("the", "a") ++ Seq.fill(48)("12345")).mkString(" ")), // alpha frac < 0.8
    doc(5, Seq.fill(50)("word").mkString(" ")),           // no stop words
    doc(6, fiftyGood + " lorem ipsum dolor"),             // C4 boilerplate marker
    doc(7, "")                                            // empty
  ).toDF("doc_id", "text")

  test("qualityProfile: each gate binds on its designed failure case") {
    val p = HeuristicFilters.qualityProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0).getAs[Boolean]("keep"))
    assert(!p(1).getAs[Boolean]("g_word_count") && !p(1).getAs[Boolean]("keep"))
    assert(!p(2).getAs[Boolean]("g_word_len") && !p(2).getAs[Boolean]("keep"))
    assert(!p(3).getAs[Boolean]("g_symbol") && !p(3).getAs[Boolean]("keep"))
    assert(!p(4).getAs[Boolean]("g_alpha") && !p(4).getAs[Boolean]("keep"))
    assert(!p(5).getAs[Boolean]("g_stop") && !p(5).getAs[Boolean]("keep"))
    assert(!p(6).getAs[Boolean]("g_c4") && !p(6).getAs[Boolean]("keep"))
    assert(p(7).getAs[Long]("n_words") === 0L)
    assert(p(7).isNullAt(p(7).fieldIndex("mean_word_len")),
      "mean word length undefined on an empty doc")
    assert(!p(7).getAs[Boolean]("keep"))
  }

  test("qualityProfile stats: integer-exact counts") {
    val p = HeuristicFilters.qualityProfile(docs)
      .filter($"doc_id" === 0).head()
    assert(p.getAs[Long]("n_words") === 50L)
    assert(p.getAs[Long]("stop_hits") === 2L)
    // (3 + 1 + 48*4) / 50 = 3.92
    assert(p.getAs[Double]("mean_word_len") === 3.92)
  }

  test("qualityFilter: keeps passing rows with the original schema") {
    val kept = HeuristicFilters.qualityFilter(docs)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L))
  }

  test("c4CleanLines: terminal punctuation + min words + boilerplate markers") {
    val text = Seq(
      "This is a proper sentence.",         // kept
      "Short one.",                          // dropped: < 3 words
      "no terminal punctuation here",        // dropped: no [.!?"'] ending
      "Please enable javascript to view.",   // dropped: boilerplate marker
      "Another good line stays here!"        // kept
    ).mkString("\n")
    val out = Seq(Tuple1(text)).toDF("text")
      .select(HeuristicFilters.c4CleanLines($"text").as("clean"))
      .head.getString(0)
    assert(out === "This is a proper sentence.\nAnother good line stays here!")
  }

  test("c4CleanLines: empty when nothing survives") {
    val out = Seq(Tuple1("all lowercase no punct")).toDF("text")
      .select(HeuristicFilters.c4CleanLines($"text").as("clean"))
      .head.getString(0)
    assert(out === "")
  }
}
