package graft

/** The pure arithmetic of Bench's out-of-band defense gate, extracted so
  * the clamp/flag behavior is spec-pinned (BenchPolicySpec) instead of
  * living only inside a 35-minute benchmark run.
  *
  * The r16 verdict's blind spot in one sentence: references that
  * self-anchor at run start with only a lower clamp let a uniformly
  * contended session grade itself clean. The calibration clamp here is the
  * fix — see PROFILING.md round 17.
  */
object BenchPolicy {
  /** Flat `"key":{"q":1.23,...}` map extraction from the sidecar JSON.
    * Nonpositive entries are dropped AT PARSE: the `mins` fallback carries
    * a -1.0 "no valid rep" sentinel for errored queries, and a sentinel
    * that reached an elementwise-min ledger merge would lock itself in as
    * a permanent fake best. */
  def parseQueryMap(txt: String, key: String): Map[String, Double] =
    ("\"" + key + "\":\\{([^}]*)\\}").r.findFirstMatchIn(txt).map { m =>
      """"([^"]+)":(-?[0-9.]+)""".r.findAllMatchIn(m.group(1))
        .map(g => g.group(1) -> g.group(2).toDouble)
        .filter(_._2 > 0.0).toMap
    }.getOrElse(Map.empty)

  /** One field of the sidecar's `floor_calib` object. */
  def parseCalib(txt: String, key: String): Option[Long] =
    ("\"floor_calib\":\\{[^}]*\"" + key + "\":([0-9]+)").r
      .findFirstMatchIn(txt).map(_.group(1).toLong)

  /** A contended-test reference clamped from BOTH sides: below at the
    * physical floor (a suspiciously fast start must not bias every later
    * test toward "contended"), above at 1.25x the calibrated quiet band (a
    * contended start must not raise the bar every later test is judged
    * against — r16 weak #1). A broken run-start probe (Long.MaxValue)
    * therefore falls back to the calibration, never to "everything is
    * clean". */
  def clampedRef(runStartMs: Long, calibMs: Long, lowerMs: Long): Long =
    math.max(math.min(runStartMs, (1.25 * calibMs).round), lowerMs)

  /** Run-start inflation vs the calibrated quiet band — the max of the two
    * probes' ratios, so EITHER instrument reading hot flags the run. */
  def inflation(runStartQuickMs: Long, runStartJobMs: Long,
      calibQuickMs: Long, calibJobMs: Long): Double =
    math.max(runStartQuickMs.toDouble / calibQuickMs,
      runStartJobMs.toDouble / calibJobMs)

  /** The run-level drift verdict: >1.5x calibrated quiet at run start. */
  def windowInflated(inflationFactor: Double): Boolean = inflationFactor > 1.5

  /** Next round's calibration: best run-start pair ever seen, clamped
    * below so one freak-fast probe can never lock in an unattainable bar
    * that flags every future run inflated. */
  def mergedCalib(calibMs: Long, runStartMs: Long, lowerMs: Long): Long =
    math.max(math.min(calibMs, runStartMs), lowerMs)
}
