package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter join pruning — the runtime-filter pattern that
  * turns "shuffle 100 TB of probe rows to discover most match nothing"
  * into "drop them at the scan".
  *
  * The filter is not an opaque engine blob (contrast
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, whose bits are
  * engine-private): it is a DataFrame of set bit positions, built with the
  * same md5-derived hashing as [[Sketches]], so it can be persisted,
  * shipped across systems, and re-verified anywhere — and the DuckDB
  * oracle rebuilds it bit-for-bit.
  *
  * Scale shape: the build side aggregates to at most `m` distinct bit
  * rows (16 KB of longs at the default m) regardless of build row count —
  * one map-side-combined shuffle. The probe side then takes `k` broadcast
  * LEFT SEMI joins against that tiny frame: map-only, no probe shuffle, no
  * row expansion — each semi join ANDs one more "bit is set" predicate.
  * False positives pass (bounded by the classic (1-e^{-kn/m})^k), false
  * negatives are impossible — the pruned frame is always a superset of the
  * true matches, so correctness of the downstream join is unaffected.
  */
object BloomJoin {

  val DefaultM = 16384
  val DefaultK = 3

  /** Bit position of hash function `i` for `key`: md5-derived, engine
    * neutral. */
  def bitPos(key: Column, i: Int, m: Int): Column =
    pmod(Sketches.md5Bits60(concat(lit(s"$i:"), key.cast("string"))), lit(m.toLong))

  /** The filter: distinct bit positions set by the build side's keys.
    * At most `m` rows, whatever the build cardinality. */
  def buildBits(build: DataFrame, key: Column, m: Int = DefaultM,
      k: Int = DefaultK): DataFrame =
    build.select(explode(array((0 until k).map(i => bitPos(key, i, m)): _*))
        .as("bit"))
      .distinct()

  /** Prune `probe` to rows whose key has ALL k bits set: k broadcast
    * left-semi joins, each a map-only pass. Superset of the true matches. */
  def prune(probe: DataFrame, key: Column, bits: DataFrame,
      m: Int = DefaultM, k: Int = DefaultK): DataFrame =
    (0 until k).foldLeft(probe) { (d, i) =>
      d.join(broadcast(bits), bitPos(key, i, m) === bits("bit"), "left_semi")
    }
}
