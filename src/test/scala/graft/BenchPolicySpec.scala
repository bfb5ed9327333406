package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the out-of-band gate's calibration arithmetic (r16 verdict #1):
  * without these, the clamp/flag behavior is only exercisable inside a
  * 35-minute official bench run. */
class BenchPolicySpec extends AnyFunSuite {

  test("clampedRef clamps from above: a contended run start cannot raise " +
      "the reference past 1.25x the calibrated quiet band") {
    // r16's driver run: job-floor 946 ms at run start vs calib 497
    assert(BenchPolicy.clampedRef(946L, 497L, 350L) === 621L)
    // a quiet start below the cap self-anchors as before
    assert(BenchPolicy.clampedRef(400L, 497L, 350L) === 400L)
  }

  test("clampedRef clamps from below: a freak-fast probe cannot bias every " +
      "later test toward contended") {
    assert(BenchPolicy.clampedRef(90L, 497L, 350L) === 350L)
    assert(BenchPolicy.clampedRef(120L, 190L, 150L) === 150L)
  }

  test("a broken run-start probe (MaxValue sentinel) falls back to the " +
      "calibration cap and reads inflated — never 'everything is clean'") {
    val ref = BenchPolicy.clampedRef(Long.MaxValue, 497L, 350L)
    assert(ref === 621L)
    val infl = BenchPolicy.inflation(Long.MaxValue, 500L, 190L, 497L)
    assert(BenchPolicy.windowInflated(infl))
  }

  test("window_inflated fires iff EITHER probe's run-start exceeds 1.5x " +
      "its calibration") {
    // r16's driver window: quick 378/190 = 1.99x, job 946/497 = 1.90x
    assert(BenchPolicy.windowInflated(
      BenchPolicy.inflation(378L, 946L, 190L, 497L)))
    // quiet start: both inside the band
    assert(!BenchPolicy.windowInflated(
      BenchPolicy.inflation(210L, 550L, 190L, 497L)))
    // one hot instrument is enough
    assert(BenchPolicy.windowInflated(
      BenchPolicy.inflation(210L, 800L, 190L, 497L)))
  }

  test("mergedCalib carries the best run-start forward, clamped below") {
    assert(BenchPolicy.mergedCalib(497L, 430L, 350L) === 430L) // improves
    assert(BenchPolicy.mergedCalib(497L, 946L, 350L) === 497L) // keeps
    assert(BenchPolicy.mergedCalib(497L, 90L, 350L) === 350L)  // freak-fast
  }

  test("legStall fires on the r16 run-5 decomposition (normal p50, p99 far " +
      "above it) and stays quiet on clean and uniformly-slow legs") {
    // r16 run 5's in-memory leg: batch p50 679 / p99 3,693 at a 1 s
    // trigger — all four bracketing probes clean, delivered p99 4,899
    assert(BenchPolicy.legStall(679L, 3693L, 1000L))
    // r17 committed clean band: durable 501/1147, in-memory-like 597/1595
    assert(!BenchPolicy.legStall(501L, 1147L, 1000L))
    assert(!BenchPolicy.legStall(597L, 1595L, 1000L))
    // a uniformly slow leg (elevated p50) is inflation, not a stall
    assert(!BenchPolicy.legStall(2500L, 9000L, 1000L))
    // VOD at its 5 s trigger: sub-second batches, wide absolute bar
    assert(!BenchPolicy.legStall(400L, 859L, 5000L))
    assert(BenchPolicy.legStall(400L, 11000L, 5000L))
  }

  test("trivialExempt covers exactly the r17 sub-second floor-noise cohort " +
      "and never a material excursion") {
    // q02-style: 300 ms at a 500 ms floor reading 2x its 150 ms ledger
    assert(BenchPolicy.trivialExempt(0.3, 0.15))
    assert(BenchPolicy.trivialExempt(0.9, 0.45))
    // material in absolute terms: not exempt even when sub-second
    assert(!BenchPolicy.trivialExempt(0.95, 0.2))
    // over a second: never exempt
    assert(!BenchPolicy.trivialExempt(5.0, 2.9))
    assert(!BenchPolicy.trivialExempt(1.2, 1.0))
  }

  test("a redefined query (oracle SQL changed) drops its stale ledger " +
      "entry mechanically; untagged entries are grandfathered") {
    val oldSql = "SELECT a FROM t ORDER BY a"
    val newSql = "SELECT a, b FROM t ORDER BY a"
    val stored = Map("q1" -> BenchPolicy.defTag(oldSql),
      "q2" -> BenchPolicy.defTag("SELECT 1"))
    val current = Map("q1" -> BenchPolicy.defTag(newSql),
      "q2" -> BenchPolicy.defTag("SELECT 1"),
      "q3" -> BenchPolicy.defTag("SELECT 3"))
    val ledger = Map("q1" -> 2.5, "q2" -> 1.0, "q3" -> 0.7, "q4" -> 9.9)
    val kept = BenchPolicy.filterByDefTags(ledger, stored, current)
    assert(kept === Map("q2" -> 1.0, "q3" -> 0.7, "q4" -> 9.9),
      "q1 (redefined) must drop; q3 (no stored tag) and q4 (no tag at " +
        "all) are grandfathered")
  }

  test("defTag is whitespace-insensitive (formatting edits don't " +
      "invalidate ledgers) but content-sensitive") {
    assert(BenchPolicy.defTag("SELECT  a\n FROM t") ===
      BenchPolicy.defTag("SELECT a FROM t"))
    assert(BenchPolicy.defTag("SELECT a FROM t") !==
      BenchPolicy.defTag("SELECT b FROM t"))
    assert(BenchPolicy.defTag("x").matches("[0-9a-f]{12}"))
  }

  test("parseStringMap round-trips the def_tags shape Bench writes") {
    val txt = ""","def_tags":{"q01_x":"ab12cd34ef56","q02_y":"0011223344aa"},"""
    assert(BenchPolicy.parseStringMap(txt, "def_tags") ===
      Map("q01_x" -> "ab12cd34ef56", "q02_y" -> "0011223344aa"))
    assert(BenchPolicy.parseStringMap("{}", "def_tags") === Map.empty)
  }

  test("median averages the two middle elements for even sizes, so one " +
      "appended clean rep can repair a two-contended-reps median (r17 advice)") {
    // the advice's exact scenario: 3 reps, two contended, one clean retry
    // appended — the upper-middle pick kept 8.0 as the median; averaged
    // middles move it to 5.0
    assert(BenchPolicy.median(Seq(2.0, 8.0, 9.0)) === 8.0)
    assert(BenchPolicy.median(Seq(2.0, 8.0, 9.0, 2.0)) === 5.0)
    // odd sizes keep the exact middle element
    assert(BenchPolicy.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    // error sentinels are excluded before the middle is picked
    assert(BenchPolicy.median(Seq(-1.0, 4.0, 6.0)) === 5.0)
    assert(BenchPolicy.median(Seq(-1.0, -1.0)) === -1.0)
    assert(BenchPolicy.median(Seq.empty) === -1.0)
  }

  test("parseQueryMap extracts a ledger and drops error sentinels at parse") {
    val txt = """{"x":1,"hist_med":{"q1":1.500,"q2":-1.000,"q3":0.250},"y":2}"""
    assert(BenchPolicy.parseQueryMap(txt, "hist_med") ===
      Map("q1" -> 1.5, "q3" -> 0.25))
    assert(BenchPolicy.parseQueryMap(txt, "absent") === Map.empty)
  }

  test("parseCalib round-trips the exact shape Bench writes") {
    val txt = ""","floor_calib":{"quick_ms":190,"job_ms":497},"""
    assert(BenchPolicy.parseCalib(txt, "quick_ms") === Some(190L))
    assert(BenchPolicy.parseCalib(txt, "job_ms") === Some(497L))
    assert(BenchPolicy.parseCalib("{}", "quick_ms") === None)
  }

  test("the committed sidecar's ledgers parse: hist_med covers the " +
      "catalog and floor_calib is present") {
    val root = sys.env.getOrElse("SPARK_GRAFT_REPO",
      sys.props.getOrElse("user.dir", "."))
    val p = java.nio.file.Paths.get(s"$root/BENCH_SIDECAR.json")
    if (java.nio.file.Files.exists(p)) {
      val txt = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val med = BenchPolicy.parseQueryMap(txt, "hist_med")
      val best = BenchPolicy.parseQueryMap(txt, "hist_best")
      assert(med.size >= best.size - 5,
        "hist_med ledger missing or far smaller than hist_best")
      // a best-ever median can never undercut the best-ever min
      val under = med.filter { case (q, m) =>
        best.get(q).exists(b => m < b - 1e-9) }
      assert(under.isEmpty, s"hist_med < hist_best for: ${under.keys}")
      assert(BenchPolicy.parseCalib(txt, "quick_ms").nonEmpty)
      assert(BenchPolicy.parseCalib(txt, "job_ms").nonEmpty)
    }
  }
}
