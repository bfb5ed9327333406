package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) record matching with sound positional-segment
  * blocking — the classic entity-resolution pipeline shape: cheap blocking
  * keys → bounded candidate join → exact refinement. Complements the
  * set-similarity dedup family in [[Dedup]] (Jaccard/MinHash/SimHash): those
  * measure token-set overlap; this measures character-level edit distance,
  * which catches typo-class near-duplicates token-set methods miss.
  *
  * Blocking soundness: each record's match key is normalized to a FIXED
  * width and split into `segments` equal-width aligned segments. Two keys
  * within Hamming distance < `segments` must agree on at least one aligned
  * segment (pigeonhole), so for substitution-dominated noise the block join
  * is a complete candidate generator at `maxEdit ≤ segments − 1`. General
  * insert/delete edits can shift all segments; production stacks layer a
  * second generator for those (here: [[Dedup]]'s shingle-based family) —
  * the same belt-and-suspenders union as `ensembleNearDups`.
  *
  * Scale shape: the candidate join keys on (segment index, segment text) —
  * posting lists per 8-char segment value, never all-pairs. The expensive
  * O(len²) `levenshtein` runs once per DISTINCT candidate pair, after the
  * cheap exact-length bound (|len(a)−len(b)| ≤ maxEdit is free here since
  * keys are fixed-width). Each side projects to (id, key) before the join —
  * no document text crosses the wire.
  */
object EntityResolution {

  /** Near-identical pairs by edit distance on the fixed-width normalized
    * head of the text (a stand-in for a title/name field), `id_a < id_b`.
    * Key = first `keyLen` chars of trimmed text, right-padded with '#' so
    * every key is exactly `keyLen` wide and segment boundaries align.
    */
  def segmentBlockedFuzzyPairs(
      docs: DataFrame,
      keyLen: Int = 40,
      segments: Int = 5,
      maxEdit: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(keyLen % segments == 0, s"keyLen $keyLen must divide into $segments segments")
    val segW = keyLen / segments
    val keyed = docs.select(col(idCol).as("id"),
      rpad(substring(trim(col(textCol)), 1, keyLen), keyLen, "#").as("key"))
    // One row per (record, segment): the blocking index. explode over a
    // generated array keeps this a single codegen stage.
    val segs = keyed.select(col("id"), col("key"),
        explode(sequence(lit(1), lit(segments))).as("seg_idx"))
      .select(col("id"), col("key"), col("seg_idx"),
        col("key").substr((col("seg_idx") - 1) * segW + 1, lit(segW)).as("seg"))
    val cands = segs.as("a").join(segs.as("b"),
        col("a.seg_idx") === col("b.seg_idx") &&
        col("a.seg") === col("b.seg") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.key").as("key_a"), col("b.key").as("key_b"))
      .distinct() // a pair sharing several segments refines once, not thrice
    cands
      .withColumn("edit_dist", levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("edit_dist") <= maxEdit)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }
}
