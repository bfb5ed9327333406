package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    // key 1: value changes a -> b -> a, with a late-writer tie at t2
    (1L, ts("2024-01-01 00:00:00"), "a", 10L),
    (1L, ts("2024-01-02 00:00:00"), "zz", 20L), // loses the t2 tie
    (1L, ts("2024-01-02 00:00:00"), "b", 21L),  // wins: higher event_id
    (1L, ts("2024-01-03 00:00:00"), "b", 30L),  // consecutive dup: collapses
    (1L, ts("2024-01-04 00:00:00"), "a", 40L),
    // key 2: single observation
    (2L, ts("2024-01-05 00:00:00"), "x", 50L)
  ).toDF("k", "t", "v", "eid")

  private lazy val hist =
    Scd2.fromLog(log, "k", "t", "v", "eid").cache()

  test("intervals chain per key, latest writer wins ties, dups collapse") {
    val k1 = hist.filter($"k" === 1L)
      .orderBy($"version")
      .select($"version", $"v", $"valid_from", $"valid_to", $"is_current")
      .collect()
    assert(k1.map(_.getString(1)).toSeq === Seq("a", "b", "a"))
    assert(k1.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // each interval ends where the next begins
    assert(k1(0).getTimestamp(3) === k1(1).getTimestamp(2))
    assert(k1(1).getTimestamp(3) === k1(2).getTimestamp(2))
    assert(k1(1).getTimestamp(2) === ts("2024-01-02 00:00:00"))
    assert(k1.map(_.getBoolean(4)).toSeq === Seq(false, false, true))
    val k2 = hist.filter($"k" === 2L).collect()
    assert(k2.length === 1 && k2.head.getAs[Boolean]("is_current"))
  }

  test("snapshotAt reconstructs the dimension at any point in time") {
    def at(s: String): Map[Long, String] =
      Scd2.snapshotAt(hist, lit(ts(s)))
        .select($"k", $"v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at("2024-01-01 12:00:00") === Map(1L -> "a"))
    assert(at("2024-01-03 12:00:00") === Map(1L -> "b"))
    assert(at("2024-01-06 00:00:00") === Map(1L -> "a", 2L -> "x"))
    assert(at("2023-12-31 00:00:00") === Map.empty[Long, String])
  }
}
