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

  /** Mid-leg stall verdict from fields the leg result already carries
    * (r17 verdict #2): a normal batch p50 with a batch p99 far above it
    * means a multi-second straggler INSIDE the measured window — the one
    * contention class the bracketing floor probes are structurally blind
    * to (r16 run 5: batch p50 679 / p99 3,693 ms with all four probes
    * clean, and the in-memory delivered p99 ballooned to 4,899). The p99
    * must clear both a ratio bar (3x p50) and an absolute bar (p50 + 2
    * trigger periods) so a sub-second-batch leg can't read "stall" on
    * millisecond noise; a leg whose p50 is itself elevated (> 1.5x the
    * trigger) is uniformly slow, not stalled — that verdict belongs to
    * the inflation fields, not this one. */
  def legStall(batchP50Ms: Long, batchP99Ms: Long, triggerMs: Long): Boolean =
    batchP50Ms <= 1.5 * triggerMs &&
      batchP99Ms > math.max(3L * batchP50Ms, batchP50Ms + 2 * triggerMs)

  /** Sub-second floor-noise exemption (r17 verdict #5): a 300 ms query at
    * a 500 ms scheduling floor reads 2x its ledger entry on pure noise —
    * the r17 committed record's entire >2x cohort was such queries. A
    * ratio cohort entry must be BOTH over the ratio bar and material in
    * absolute terms; medians under 1 s whose delta vs the ledger is under
    * 0.5 s are floor noise, not signal. (The retry gates are already
    * unspendable on these — their absolute trigger is min_sec 1.5 — but
    * the exemption is wired there too so the properties can't drift
    * apart under env overrides.) */
  def trivialExempt(medianSec: Double, histMedSec: Double): Boolean =
    medianSec < 1.0 && medianSec - histMedSec < 0.5

  /** Flat `"key":{"q":"tag",...}` string-valued map from the sidecar. */
  def parseStringMap(txt: String, key: String): Map[String, String] =
    ("\"" + key + "\":\\{([^}]*)\\}").r.findFirstMatchIn(txt).map { m =>
      """"([^"]+)":"([^"]+)"""".r.findAllMatchIn(m.group(1))
        .map(g => g.group(1) -> g.group(2)).toMap
    }.getOrElse(Map.empty)

  /** Definition tag for a catalog query: a short stable hash of its oracle
    * SQL, whitespace-normalized so formatting-only edits don't invalidate
    * ledgers. The mechanical form of the r17 window lesson (q158): a
    * ledger entry measured under a different DEFINITION of the query is a
    * measurement of a different query, and merging it plants an
    * unreachable reference the gate burns its retry budget chasing. */
  def defTag(oracleSql: String): String = {
    val norm = oracleSql.replaceAll("\\s+", " ").trim
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Drop ledger entries whose stored definition tag mismatches the
    * current one. Entries untagged on EITHER side are kept: tags only
    * invalidate positively-known redefinitions — history predating the
    * mechanism stays under the r17 era-window rules. */
  def filterByDefTags(ledger: Map[String, Double],
      stored: Map[String, String],
      current: Map[String, String]): Map[String, Double] =
    ledger.filter { case (q, _) =>
      (stored.get(q), current.get(q)) match {
        case (Some(s), Some(c)) => s == c
        case _ => true
      }
    }

  /** Median over the VALID (nonnegative) entries, averaging the two middle
    * elements for even sizes. The upper-middle pick the bench used through
    * r17 made the clean-floor median retry a no-op in its own headline
    * scenario (r17 advice, medium): appending one fast clean rep to an
    * odd-sized set keeps the upper-middle element — the contended rep —
    * as the median. Averaged middles let a single clean rep move an
    * even-sized set's median, which is the entire point of the retry. */
  def median(raw: Seq[Double]): Double = {
    val ok = raw.filter(_ >= 0.0).sorted
    if (ok.isEmpty) -1.0
    else if (ok.size % 2 == 1) ok(ok.size / 2)
    else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
  }
}
