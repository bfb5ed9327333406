package graft.operators

import graft.SparkSpec

/** Contracts for the eval-overlap decontamination operator: exact overlap
  * counts on a crafted fixture, distinctness of the counted grams, and the
  * no-corpus-shuffle broadcast plan shape. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  // Eval doc grams (n=3): {"q w e", "w e r"}
  private val evalDocs = Seq((100L, "q w e r")).toDF("doc_id", "text")

  private val corpus = Seq(
    // shares both eval grams (and repeats one — must still count once)
    (1L, "q w e r q w e"),
    // shares exactly one
    (2L, "z z w e r"),
    // shares none
    (3L, "a b c d"),
    // too short for any gram
    (4L, "q w")
  ).toDF("doc_id", "text")

  test("overlap: distinct shared-gram counts; clean docs absent") {
    val got = Decontamination.overlap(corpus, evalDocs, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared"))
      .toMap
    assert(got === Map(1L -> 2L, 2L -> 1L),
      "doc 1 shares both grams (each once, despite repetition), doc 2 one, docs 3/4 none")
  }

  test("overlap broadcasts the eval gram set (corpus side never shuffles for the join)") {
    val plan = Decontamination.overlap(corpus, evalDocs, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side must broadcast:\n$plan")
    val shuffled = Decontamination.overlap(corpus, evalDocs, n = 3, broadcastEval = false)
    // still correct without the hint (plan choice is Catalyst's)
    val got = shuffled.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("overlap against an empty eval set flags nothing") {
    val got = Decontamination.overlap(corpus, evalDocs.filter($"doc_id" < 0), n = 3)
    assert(got.count() === 0L)
  }

  test("clean = corpus minus flagged docs (complement of overlap)") {
    val kept = Decontamination.clean(corpus, evalDocs, n = 3)
      .collect().map(_.getLong(0)).toSet
    val flagged = Decontamination.overlap(corpus, evalDocs, n = 3)
      .collect().map(_.getLong(0)).toSet
    val all = corpus.collect().map(_.getLong(0)).toSet
    assert(kept === all -- flagged)
    assert(kept === Set(3L, 4L), "docs sharing eval grams are gone; clean and short docs stay")
  }

  test("hashed-gram form matches the string form (fixture corpus + crafted docs)") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(asMap(Decontamination.overlap(corpus, evalDocs, n = 3, hashGrams = true)) ===
      asMap(Decontamination.overlap(corpus, evalDocs, n = 3)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val ev = docs.filter($"doc_id" % 97 === 0)
    val tr = docs.filter($"doc_id" % 97 =!= 0)
    assert(asMap(Decontamination.overlap(tr, ev, hashGrams = true)) ===
      asMap(Decontamination.overlap(tr, ev)),
      "hashed and string grams must agree on the real corpus")
  }
}
