package graft.functions

import org.apache.spark.sql.graft.{ArrayExpressions, GraftExtensions, VectorExpressions}

import graft.SparkSpec

/** The SQL surface of the native kernels (SparkSessionExtensions /
  * FunctionRegistry injection): each function must be callable from
  * spark.sql(...) and bit-identical to its Scala Column wrapper. */
class GraftExtensionsSpec extends SparkSpec {

  test("float_dot / sliding_min / char_gram_hashes are callable from SQL, parity with wrappers") {
    GraftExtensions.registerInto(spark)
    import spark.implicits._

    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f),
        Array(9L, 3L, 7L, 1L, 8L), "hello graft world")
    ).toDF("a", "b", "xs", "s")
    df.createOrReplaceTempView("ext_t")

    val sqlRow = spark.sql(
      """SELECT float_dot(a, b) AS d,
        |       sliding_min(xs, 3) AS m,
        |       char_gram_hashes(s, 5) AS g,
        |       word_shingles(s, 2) AS w
        |FROM ext_t""".stripMargin).collect().head
    val wrapRow = df.select(
      VectorExpressions.floatDot($"a", $"b").as("d"),
      ArrayExpressions.slidingMin($"xs", 3).as("m"),
      ArrayExpressions.charGramHashes($"s", 5).as("g"),
      ArrayExpressions.wordShingles($"s", 2).as("w")).collect().head

    assert(sqlRow.getDouble(0) === 32.0)
    assert(sqlRow.getDouble(0) === wrapRow.getDouble(0))
    assert(sqlRow.getSeq[Long](1) === Seq(3L, 1L, 1L))
    assert(sqlRow.getSeq[Long](1) === wrapRow.getSeq[Long](1))
    assert(sqlRow.getSeq[Long](2) === wrapRow.getSeq[Long](2))
    assert(sqlRow.getSeq[Long](2).length === "hello graft world".length - 4)
    assert(sqlRow.getSeq[String](3) === Seq("hello graft", "graft world"))
    assert(sqlRow.getSeq[String](3) === wrapRow.getSeq[String](3))
    // fused hash kernel: SQL form equals xxhash64 over the SQL shingles
    val hashes = spark.sql(
      """SELECT word_shingle_hashes(s, 2) AS h,
        |       transform(word_shingles(s, 2), x -> xxhash64(x)) AS h2
        |FROM ext_t""".stripMargin).collect().head
    assert(hashes.getSeq[Long](0) === hashes.getSeq[Long](1))
  }

  test("minhash_signature is callable from SQL, parity with Dedup.minhashSignature") {
    GraftExtensions.registerInto(spark)
    import spark.implicits._

    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",  // fewer tokens than the shingle width -> all-sentinel slots
      "a b c d e"
    ).toDF("text")
    df.createOrReplaceTempView("ext_mh")

    val sql = spark.sql(
      "SELECT minhash_signature(text, 3, 64) AS sig FROM ext_mh")
      .collect().map(_.getSeq[Long](0))
    val wrap = df.select(
      graft.operators.Dedup.minhashSignature($"text", 64, 3).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sql.length === 3)
    sql.zip(wrap).foreach { case (s, w) => assert(s === w) }
    assert(sql(1) === Seq.fill(64)(Long.MaxValue))
  }

  test("text-analysis family is SQL-callable, parity with TextFunctions wrappers") {
    GraftExtensions.registerInto(spark)
    import spark.implicits._
    import graft.functions.TextFunctions

    val df = Seq(
      "The quick brown fox jumps over the lazy dog and then naps.",
      "der schnelle braune fuchs springt und die katze schaut zu",
      ""
    ).toDF("text")
    df.createOrReplaceTempView("ext_text")

    val sql = spark.sql(
      """SELECT token_count(text) AS tc, bpeish_token_count(text) AS bc,
        |       quality_score(text) AS qs, lang_id(text) AS lid,
        |       doc_fingerprint(text) AS fp,
        |       jaccard_sim(distinct_shingles(text, 3), distinct_shingles(text, 3)) AS selfj
        |FROM ext_text""".stripMargin).collect()
    val wrap = df.select(
      TextFunctions.tokenCount($"text").as("tc"),
      TextFunctions.bpeishTokenCount($"text").as("bc"),
      TextFunctions.qualityScore($"text").as("qs"),
      TextFunctions.langId($"text").as("lid"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.jaccard(
        TextFunctions.distinctShingles($"text", 3),
        TextFunctions.distinctShingles($"text", 3)).as("selfj")).collect()
    sql.zip(wrap).foreach { case (s, w) =>
      (0 until 6).foreach(i => assert(s.get(i) === w.get(i), s"column $i"))
    }
    // sanity: the English row identifies as en, self-jaccard is 1.0
    assert(sql(0).getAs[String]("lid") === "en")
    assert(sql(1).getAs[String]("lid") === "de")
    assert(sql(0).getAs[Double]("selfj") === 1.0)
  }

  test("width arguments must be integer literals (they parameterize codegen)") {
    GraftExtensions.registerInto(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT sliding_min(array(1L, 2L), 1 + 1) FROM (SELECT 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
