package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ReportNumbers

/** Pins the v3 Numbers-block additions (r17 verdict #1/#2/#5) against a
  * synthetic sidecar: per-leg window verdicts must be read from the exact
  * `stream_floors` shape Bench writes, and the ratio cohorts must apply
  * the sub-second floor-noise exemption. Regex-shape drift between Bench's
  * writer and this parser would otherwise only surface as a silently
  * "n/a" block after a 35-minute official run. */
class ReportNumbersSpec extends AnyFunSuite {

  private val sidecar =
    """{"metric":"total","value":9.9,"unit":"sec",""" +
      """"queries":{"q_big":3.000,"q_small":0.300,"q_fine":1.000,"q_err":-1.000},""" +
      """"mins":{"q_big":2.800,"q_small":0.250,"q_fine":0.900},""" +
      """"hist_med":{"q_big":1.400,"q_small":0.140,"q_fine":0.950},""" +
      """"chunk_p99_ms_exact":2232,"chunk_p50_ms_exact":1500,""" +
      """"chunk_p99_ms_exact_mem":2284,"vod_chunk_p95_ms_exact":6215,""" +
      """"stream_p99_ms_durable":1147,"stream_retries":0,""" +
      """"stream_floors":{"in_memory":{"before_ms":[395,518],"after_ms":[376,402],""" +
      """"job_before_ms":686,"job_after_ms":470,"quick3_before_ms":401,""" +
      """"leg_inflation":1.38,"leg_window_inflated":false,"leg_stall":false},""" +
      """"durable":{"before_ms":[356,400],"after_ms":[348,411],""" +
      """"job_before_ms":605,"job_after_ms":547,"quick3_before_ms":360,""" +
      """"leg_inflation":1.89,"leg_window_inflated":true,"leg_stall":false},""" +
      """"vod":{"before_ms":[323,391],"after_ms":[312,360],""" +
      """"job_before_ms":525,"job_after_ms":428,"quick3_before_ms":330,""" +
      """"leg_inflation":1.74,"leg_window_inflated":true,"leg_stall":true}},""" +
      """"ob_policy":{"window_inflated":true,"window_inflation":1.75,""" +
      """"retries_used":3},"sf":"/root/testdata/sf0.1"}"""

  test("per-leg window lines carry each leg's own inflation/inflated/stall") {
    val b = ReportNumbers.block(sidecar)
    assert(b.contains(
      "- leg_window (in_memory): inflation 1.38, inflated false, stall false"))
    assert(b.contains(
      "- leg_window (durable): inflation 1.89, inflated true, stall false"))
    assert(b.contains(
      "- leg_window (vod): inflation 1.74, inflated true, stall true"))
    // the batch-loop flag stays a DISTINCT labeled fact
    assert(b.contains("- window_inflated (batch loop): true"))
  }

  test("cohort lines apply the trivial exemption: q_big (3.0/1.4 = 2.1x) " +
      "counts, q_small (0.3/0.14 = 2.1x but sub-second noise) is exempted") {
    val b = ReportNumbers.block(sidecar)
    assert(b.contains("- cohort_gt_1_5x_hist_med_excl_trivial: 1"))
    assert(b.contains("- cohort_gt_2x_hist_med_excl_trivial: 1"))
    assert(b.contains("- cohort_trivial_exempted: 1"))
  }

  test("a sidecar without stream legs or ledgers degrades to n/a lines, " +
      "never a parse failure") {
    val b = ReportNumbers.block("""{"metric":"total","value":1.0,"sf":"x"}""")
    assert(b.contains("- leg_window (durable): inflation n/a, " +
      "inflated n/a, stall n/a"))
    assert(b.contains("- cohort_gt_2x_hist_med_excl_trivial: n/a"))
    assert(b.startsWith(ReportNumbers.BeginMarker))
    assert(b.endsWith(ReportNumbers.EndMarker))
  }

  test("errored queries are counted, not silently shrunk away") {
    val b = ReportNumbers.block(sidecar)
    assert(b.contains("- queries_total: 3"))
    assert(b.contains("- queries_errored: 1"))
  }
}
