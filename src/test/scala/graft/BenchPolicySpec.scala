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
