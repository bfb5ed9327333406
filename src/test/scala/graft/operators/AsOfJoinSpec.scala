package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // quotes: key A at t=10,20,20',30 (tie at 20); key B at t=100
  private def quotes = Seq(
    ("A", ts(10), 1L, 1.0), ("A", ts(20), 2L, 2.0), ("A", ts(20), 3L, 2.5),
    ("A", ts(30), 4L, 3.0), ("B", ts(100), 5L, 9.0))
    .toDF("sym", "qts", "qid", "px")

  // trades: key A at t=5 (before any quote), 20 (tie), 25, 99; key C unseen
  private def trades = Seq(
    ("A", ts(5), 10L), ("A", ts(20), 11L), ("A", ts(25), 12L),
    ("A", ts(99), 13L), ("C", ts(50), 14L))
    .toDF("sym", "tts", "tid")

  private def run(direction: String, strict: Boolean = false,
      tolMicros: Option[Long] = None): Map[Long, Option[Long]] =
    AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
      direction = direction, strict = strict, toleranceMicros = tolMicros,
      tiebreak = Some("qid"))
      .collect()
      .map(r => r.getAs[Long]("tid") ->
        Option(r.getAs[java.lang.Long]("r_qid")).map(_.longValue))
      .toMap

  test("backward: greatest quote ts <= trade ts; tie at equal ts -> max tiebreak") {
    assert(run("backward") === Map(
      10L -> None,      // t=5: nothing before
      11L -> Some(3L),  // t=20: the t=20 quotes are eligible, qid 3 wins the tie
      12L -> Some(3L),  // t=25: still the t=20 pair
      13L -> Some(4L),  // t=99: t=30 quote
      14L -> None))     // key C has no quotes
  }

  test("backward strict: a quote at exactly the trade ts is excluded") {
    assert(run("backward", strict = true)(11L) === Some(1L)) // t=20 -> t=10 quote
  }

  test("forward: smallest quote ts >= trade ts") {
    assert(run("forward") === Map(
      10L -> Some(1L),  // t=5 -> t=10
      11L -> Some(3L),  // t=20 tie, deterministic max-tiebreak winner
      12L -> Some(4L),  // t=25 -> t=30
      13L -> None,      // t=99: no quote ahead for A
      14L -> None))
  }

  test("forward strict skips the equal-ts quote") {
    assert(run("forward", strict = true)(11L) === Some(4L)) // t=20 -> t=30
  }

  test("tolerance nulls matches farther than the bound, keeps closer ones") {
    val tol = run("backward", tolMicros = Some(5L * 1000000)) // 5 s
    assert(tol(12L) === Some(3L)) // gap 5 s: inside
    assert(tol(13L) === None)     // gap 69 s: nulled
  }

  test("null timestamps never match, either side") {
    val q = Seq(("A", null.asInstanceOf[Timestamp], 1L, 1.0),
      ("A", ts(10), 2L, 2.0)).toDF("sym", "qts", "qid", "px")
    val t = Seq(("A", ts(20), 10L), ("A", null.asInstanceOf[Timestamp], 11L))
      .toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(t, q, Seq("sym"), "tts", "qts", tiebreak = Some("qid"))
      .collect()
      .map(r => r.getAs[Long]("tid") ->
        Option(r.getAs[java.lang.Long]("r_qid")).map(_.longValue)).toMap
    assert(got === Map(10L -> Some(2L), 11L -> None))
  }

  test("all right payload columns come through prefixed; left columns unchanged") {
    val row = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
      tiebreak = Some("qid")).filter($"tid" === 13L).collect().head
    assert(row.getAs[String]("sym") === "A")
    assert(row.getAs[Timestamp]("r_qts") === ts(30))
    assert(row.getAs[Double]("r_px") === 3.0)
  }

  test("plan shuffles once: single Exchange, no join operator") {
    // executedPlan is AdaptiveSparkPlanExec whose children collect() can't
    // traverse pre-execution; count Exchange nodes on the plan string.
    val plan = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts")
      .queryExecution.executedPlan.toString
    val exchanges = "- Exchange ".r.findAllIn(plan).size
    assert(exchanges === 1, s"want exactly 1 Exchange, got:\n$plan")
    assert(!plan.toLowerCase.contains("join"), "no join node expected")
  }
}
