package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed probabilistic sketches with a FULLY SPECIFIED, engine-neutral
  * construction: every hash is md5-derived and every register update is a
  * plain aggregate, so the sketch — not just its error bound — is
  * reproducible bit-for-bit by any engine that can md5 (the DuckDB oracle
  * mirrors the construction and the estimates compare EXACTLY). That is the
  * difference from `approx_count_distinct`/t-digest, whose internals are
  * engine-private: these sketches are portable artifacts a 100 TB pipeline
  * can write, merge across days, and re-verify anywhere.
  *
  * Scale shape: both sketches are one `groupBy` over (group, register) —
  * map-side partial aggregation shrinks each partition to at most the
  * register count before the shuffle, so the network cost is O(groups x
  * registers), independent of row count.
  */
object Sketches {

  /** 60 bits of md5(x), as a non-negative long (15 hex chars < 2^63). */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  // ----------------------------------------------------------------- HLL

  /** HyperLogLog with m = 2^b registers (Flajolet et al. 2007): bucket =
    * low b bits of the 60-bit hash; rho = 1 + leading-zero count of the
    * remaining (60-b)-bit suffix (suffix 0 -> maximal rho). Returns one row
    * per (group, bucket) with the register value — the mergeable sketch. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], item: Column,
      b: Int): DataFrame = {
    require(b >= 4 && b <= 16, s"b in [4,16], got $b")
    val suffixBits = 60 - b
    val h = md5Bits60(item)
    val bucket = h.bitwiseAND(lit((1L << b) - 1L))
    val w = shiftright(h, b)
    // bit length of w via bin() string length: exact, no log2 ulp risk
    val rho = when(w === 0L, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(w)))
    df.select((groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("register"))
  }

  /** Standard HLL estimate with the small-range (linear counting)
    * correction, from the registers frame. alpha_m per the paper.
    *
    * The harmonic sum is accumulated as a SCALED INTEGER — each register r
    * contributes 2^(suffixBits+1-r), an exact long (max register is
    * suffixBits+1, so the smallest term is 2^0; the sum over m ≤ 2^16
    * buckets stays < 2^61) — then converted to double ONCE and descaled by
    * an exact power of two. A double `sum(pow(2,-r))` is partition-order
    * dependent past 53 significant bits and can flip a 6-dp rounding
    * boundary between runs; the integer sum is order-free by construction,
    * which is also what makes [[HllAgg]]'s finish bit-equal to this path. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], b: Int): DataFrame = {
    val m = 1L << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scaleBits = (60 - b) + 1 // = max register value
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), lit(scaleBits) - col("register")).cast("long"))
          .as("s_scaled"),
        count(lit(1)).as("c_nonempty"))
      .withColumn("s_nonempty",
        col("s_scaled").cast("double") / lit(math.pow(2.0, scaleBits)))
      .withColumn("raw",
        lit(alpha * m * m) / (col("s_nonempty") + (lit(m) - col("c_nonempty"))))
      .withColumn("hll_estimate",
        when(col("raw") <= lit(2.5 * m) && col("c_nonempty") < m,
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("c_nonempty"))))
          .otherwise(col("raw")))
      .drop("s_scaled", "s_nonempty", "c_nonempty", "raw")
  }

  // ----------------------------------------------------------- Count-Min

  /** Row-r cell for the pre-computed 60-bit hash `h`: Kirsch-Mitzenmacher
    * double hashing, c_r = (h1 + r*h2) mod w with h1 = low 30 bits and
    * h2 = (high 30 bits | 1) — the odd stride walks the full cycle when w
    * is a power of two. ONE md5 per item serves all d rows (the same
    * one-hash-per-string, family-by-arithmetic trick as the MinHash
    * kernel); Kirsch & Mitzenmacher 2006 shows the estimate quality is
    * preserved. */
  def cmsCell(h: Column, r: Column, w: Int): Column =
    pmod(h.bitwiseAND(lit((1L << 30) - 1L)) +
      r.cast("long") * shiftright(h, 30).bitwiseOR(lit(1L)), lit(w.toLong))

  /** Count-min sketch (Cormode & Muthukrishnan 2005), d rows x w columns.
    * Returns one row per (group, r, c) with the cell count — the mergeable
    * sketch (cells sum). The d hashes derive arithmetically from one md5
    * ([[cmsCell]]), so the scan hashes each item once. */
  def cmsCells(df: DataFrame, groupCols: Seq[String], item: Column,
      d: Int, w: Int): DataFrame =
    cmsCellsWeighted(df, groupCols, item, lit(1L), d, w)

  /** [[cmsCells]] over PRE-AGGREGATED (item, weight) rows: cell count =
    * Σ weight instead of a row count. Bit-identical to feeding the
    * un-aggregated multiset through [[cmsCells]] (a cell's count is the sum
    * of the counts of the items hashing into it), but the expensive d-way
    * explode + cell hash run once per DISTINCT item — vocabulary-sized, not
    * corpus-sized. The heavy-hitter queries build their exact counts frame
    * anyway; sketching that frame instead of the raw token stream removes a
    * full corpus pass (r19, guide §2.3 aggregate-before-you-explode). */
  def cmsCellsWeighted(df: DataFrame, groupCols: Seq[String], item: Column,
      weight: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, s"bad cms shape d=$d w=$w")
    df.select((groupCols.map(col) :+ md5Bits60(item).as("__h") :+
        weight.cast("long").as("__wt") :+
        explode(sequence(lit(0), lit(d - 1))).as("r")): _*)
      .withColumn("c", cmsCell(col("__h"), col("r"), w))
      .groupBy((groupCols.map(col) ++ Seq(col("r"), col("c"))): _*)
      .agg(sum(col("__wt")).as("n"))
  }

  /** Point-query the sketch for each row of `items` (column `__item` must
    * not pre-exist): estimate = min over rows of the hashed cell — classic
    * CMS upper-bound estimate, never below the true count. */
  def cmsQuery(cells: DataFrame, groupCols: Seq[String], items: DataFrame,
      item: Column, d: Int, w: Int): DataFrame = {
    val probes = items
      .withColumn("__item", item)
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("c", cmsCell(md5Bits60(col("__item")), col("r"), w))
    // left join + coalesce: a probe whose cell nobody touched reads 0 (the
    // sketch's true cell value), not "no row" — min must see it
    probes.join(cells, groupCols ++ Seq("r", "c"), "left")
      .groupBy((groupCols.map(col) :+ col("__item")): _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_estimate"))
  }

  // ----------------------------------------------------------- Histogram

  /** Fixed-grid histogram sketch over a non-negative numeric column:
    * bucket = min(floor(value/width), b-1), one count row per occupied
    * (group, bucket). Mergeable by summing counts; shuffle bounded at
    * groups x b rows however many input rows — the quantile companion to
    * the HLL/CMS family (and, like them, engine-reproducible: the grid is
    * the spec, not an engine's private digest). */
  def histogramCells(df: DataFrame, groupCols: Seq[String], value: Column,
      width: Double, b: Int): DataFrame = {
    require(width > 0 && b >= 2, s"bad histogram shape width=$width b=$b")
    df.select((groupCols.map(col) :+
        least(floor(value / lit(width)).cast("long"), lit(b - 1L)).as("bucket")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"))
  }

  // ---------------------------------------------------- SpaceSaving (batch)

  /** Per-(buffer) SpaceSaving counter — see [[SpaceSavingAgg]]. `evicted`
    * records whether this summary EVER dropped an item (by update-time
    * eviction or merge-time pruning): only then does "absent from this
    * side" carry the min-counter uncertainty. A summary that merely REACHED
    * capacity without evicting is still the exact count map, and absent
    * items are exactly 0 — so exactness holds for vocabulary == capacity,
    * not just strictly below it. */
  final case class SSBuf(counters: Seq[StreamingTopK.Counter], evicted: Boolean)

  /** Mergeable batch SpaceSaving: the heavy-hitter companion the
    * HLL/CMS/histogram family was missing, as a typed `Aggregator` so it
    * composes with `groupBy(...).agg(...)` — partial summaries build
    * map-side and MERGE at the reducer (Agarwal et al. 2012, mergeable
    * summaries): common items sum counts and errors; an item absent from a
    * side at capacity is bounded by that side's minimum counter (the classic
    * SpaceSaving invariant: anything outside the summary has true count ≤
    * min), and the union prunes back to `capacity` by (cnt desc, item).
    * Survivor guarantees after any merge tree: est ≥ true and
    * est − err ≤ true; every item with true count > N/capacity survives.
    *
    * Determinism contract: as long as NO eviction has occurred (vocabulary
    * <= capacity — tracked per summary by [[SSBuf]]'s `evicted` flag, so a
    * full-but-exact side never taxes absent items with a phantom min bound)
    * the summary is the exact count map, identical on any partitioning —
    * the mode the oracle-checked catalog query uses. Past eviction the
    * contents depend on arrival/merge order (true of every mergeable
    * heavy-hitter sketch); the guarantees above still hold and are what
    * the spec pins. */
  final class SpaceSavingAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        StreamingTopK.ItemIn, SSBuf, Seq[StreamingTopK.Counter]] {
    import org.apache.spark.sql.{Encoder, Encoders}

    override def zero: SSBuf = SSBuf(Seq.empty, evicted = false)

    override def reduce(b: SSBuf, in: StreamingTopK.ItemIn): SSBuf = {
      // eviction happens iff the item is new while the summary is full
      val evicts = b.counters.size >= capacity && !b.counters.exists(_.item == in.item)
      SSBuf(StreamingTopK.fold(b.counters, Seq(in.item -> in.w), capacity),
        b.evicted || evicts)
    }

    override def merge(a: SSBuf, b: SSBuf): SSBuf = {
      // The min-counter bound applies to items absent from a side only if
      // that side ever evicted; a full-but-exact side bounds them at 0.
      def floor(s: SSBuf): Long =
        if (s.evicted) s.counters.map(_.cnt).min else 0L
      val (fa, fb) = (floor(a), floor(b))
      val am = a.counters.map(c => c.item -> c).toMap
      val bm = b.counters.map(c => c.item -> c).toMap
      val merged = (am.keySet ++ bm.keySet).toSeq.map { item =>
        val (ca, ea) = am.get(item).map(c => (c.cnt, c.err)).getOrElse((fa, fa))
        val (cb, eb) = bm.get(item).map(c => (c.cnt, c.err)).getOrElse((fb, fb))
        StreamingTopK.Counter(item, ca + cb, ea + eb)
      }
      SSBuf(merged.sortBy(c => (-c.cnt, c.item)).take(capacity),
        a.evicted || b.evicted || merged.size > capacity)
    }

    override def finish(r: SSBuf): Seq[StreamingTopK.Counter] =
      r.counters.sortBy(c => (-c.cnt, c.item))

    override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
    override def outputEncoder: Encoder[Seq[StreamingTopK.Counter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[StreamingTopK.Counter]]()
  }

  /** Mergeable HLL as a typed Aggregator — the SAME engine-portable md5
    * construction as [[hllRegisters]]/[[hllEstimate]], packaged so plain
    * `GROUP BY` SQL (via `udaf` registration) and STREAMING windowed
    * aggregations can build distinct-count sketches the way they call
    * `sum`. The buffer is a fixed m-byte register array; reduce folds one
    * item's rho into its bucket, merge is elementwise max — associative
    * and commutative, so any partial-aggregation or state-store merge tree
    * yields the identical registers, and the finish estimate equals the
    * frame-based [[hllEstimate]] on the same data (registers identical by
    * construction; the finish sums buckets in ascending index order, and
    * callers round the estimate to the shared 6-dp grid exactly as the
    * frame path's consumers do). */
  final class HllAgg(b: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, Array[Byte], Double] {
    import org.apache.spark.sql.{Encoder, Encoders}
    require(b >= 4 && b <= 16, s"b in [4,16], got $b")
    private val m = 1 << b
    private val suffixBits = 60 - b

    override def zero: Array[Byte] = new Array[Byte](m)

    // one digest per thread, reset per item — reduce() runs per ROW, so a
    // fresh MessageDigest + hex-string round-trip there would dominate
    @transient private lazy val mdLocal =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    override def reduce(buf: Array[Byte], item: String): Array[Byte] = {
      if (item != null) {
        val md = mdLocal.get()
        md.reset()
        val d = md.digest(item.getBytes("UTF-8"))
        // first 15 hex chars of the digest == top 60 bits of the first 8
        // bytes read big-endian (same value md5Bits60's conv() parses)
        var be = 0L
        var i = 0
        while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
        val h = be >>> 4 // 60 bits, nonnegative
        val bucket = (h & (m - 1)).toInt
        val w = h >>> b
        val rho =
          if (w == 0L) suffixBits + 1
          else suffixBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > buf(bucket)) buf(bucket) = rho.toByte
      }
      buf
    }

    override def merge(a: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b2(i) > a(i)) a(i) = b2(i); i += 1 }
      a
    }

    override def finish(r: Array[Byte]): Double = {
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      // scaled-integer harmonic sum (order-free, exact — see hllEstimate):
      // term 2^(scaleBits - r) is a long; max register = scaleBits, so the
      // smallest term is 1 and the total stays < 2^61 at any m <= 2^16
      val scaleBits = suffixBits + 1
      var sScaled = 0L
      var c = 0L
      var i = 0
      while (i < m) {
        if (r(i) > 0) { sScaled += 1L << (scaleBits - r(i)); c += 1 }
        i += 1
      }
      val s = sScaled.toDouble / math.pow(2.0, scaleBits)
      val raw = alpha * m * m / (s + (m - c))
      if (raw <= 2.5 * m && c < m) m.toDouble * math.log(m.toDouble / (m - c))
      else raw
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-group heavy hitters via [[SpaceSavingAgg]]: one aggregation, the
    * summary explodes to (group, rank, item, cnt, err) rows, top `k` per
    * group. With `capacity` ≥ the group's distinct items the output is the
    * EXACT top-k (the oracle-checkable mode); undersized capacity degrades
    * to the bounded-error sketch. */
  // ------------------------------------------------- quantile summary

  /** Compactor-buffer state for [[QuantileAgg]]: `levels(l)` holds items of
    * weight 2^l; total weight always equals the number of inserted rows. */
  final case class QsBuf(levels: Seq[Seq[Double]])

  /** Mergeable quantile summary as a typed Aggregator — the rank-query
    * companion to the HLL / CMS / SpaceSaving / histogram family, width-free
    * (no a-priori bucket grid like [[histogramQuantile]] needs).
    *
    * Structure: the classic deterministic compactor ladder (Munro &
    * Paterson 1980; the deterministic skeleton of KLL without its random
    * coin — randomness would break this engine's reproducibility contract).
    * Level l holds items of weight 2^l; when a level exceeds `m` items it
    * sorts and keeps the odd-indexed half at doubled weight. Insert is
    * amortized O(1) appends; merge concatenates level-wise then compacts —
    * associative-safe, any partial-aggregation tree yields a VALID summary.
    *
    * Exactness contract (the SpaceSaving convention): while a group's total
    * count stays ≤ m, NO compaction ever fires, the summary is the exact
    * multiset at level 0, and `finish` returns exact rank quantiles — the
    * oracle-checkable mode (q181 pins it against explicit SQL rank
    * selection). Past m, compactions introduce rank error ≤ 2^(l-1) each;
    * summed over the ladder the estimate's TRUE rank stays within
    * ~n·ceil(log2(2n/m))/m of the target for ANY merge tree (property-
    * tested with adversarial trees in SketchesSpec). Compression is
    * merge-tree-DEPENDENT (like SpaceSaving's), so only the exact mode is
    * hash-pinned cross-engine; the compressed mode pins the bound.
    *
    * `finish` returns one value per requested quantile p: the smallest
    * item whose cumulative weight reaches ceil(p · n) — the inverse
    * empirical CDF, spelled with the same double arithmetic the SQL oracle
    * uses. */
  final class QuantileAgg(m: Int, ps: Seq[Double])
      extends org.apache.spark.sql.expressions.Aggregator[Double, QsBuf, Seq[Double]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    require(m >= 2 && m % 2 == 0, s"capacity must be even and >= 2, got $m")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0, 1], got $ps")

    override def zero: QsBuf = QsBuf(Seq(Vector.empty))

    /** Sort + keep odd indices at double weight; deterministic (no coin).
      * An odd leftover stays at its level so total weight is preserved. */
    private def compact(levels: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      val out = scala.collection.mutable.ArrayBuffer(levels.map(_.toVector): _*)
      var l = 0
      while (l < out.size) {
        if (out(l).size > m) {
          val sorted = out(l).sorted
          val even = sorted.size - (sorted.size % 2)
          val promoted = (1 until even by 2).map(sorted)
          out(l) = if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
          if (l + 1 >= out.size) out += Vector.empty
          out(l + 1) = out(l + 1) ++ promoted
        }
        l += 1
      }
      out.toSeq
    }

    override def reduce(b: QsBuf, v: Double): QsBuf = {
      val levels = b.levels.updated(0, b.levels.head :+ v)
      QsBuf(if (levels.head.size > m) compact(levels) else levels)
    }

    override def merge(a: QsBuf, b: QsBuf): QsBuf = {
      val depth = math.max(a.levels.size, b.levels.size)
      val joined = (0 until depth).map { l =>
        (if (l < a.levels.size) a.levels(l) else Seq.empty) ++
          (if (l < b.levels.size) b.levels(l) else Seq.empty)
      }
      QsBuf(compact(joined))
    }

    override def finish(r: QsBuf): Seq[Double] = {
      val weighted = r.levels.zipWithIndex.flatMap { case (items, l) =>
        items.map(v => (v, 1L << l))
      }.sortBy(_._1)
      val n = weighted.map(_._2).sum
      if (n == 0L) return ps.map(_ => Double.NaN)
      ps.map { p =>
        val target = math.ceil(p * n).toLong.max(1L)
        var cum = 0L
        var i = 0
        var ans = weighted.last._1
        var found = false
        while (i < weighted.size && !found) {
          cum += weighted(i)._2
          if (cum >= target) { ans = weighted(i)._1; found = true }
          i += 1
        }
        ans
      }
    }

    override def bufferEncoder: Encoder[QsBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[QsBuf]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Per-group quantiles via [[QuantileAgg]]: one aggregation, the
    * quantile vector exploded to (group, p, q_value) rows. With `capacity`
    * ≥ the group's row count the output is EXACT rank selection (the
    * oracle-checkable mode); undersized capacity degrades to the bounded-
    * rank-error sketch. */
  def quantileSummary(df: DataFrame, groupCols: Seq[String], value: Column,
      capacity: Int, ps: Seq[Double]): DataFrame = {
    val agg = udaf(new QuantileAgg(capacity, ps),
      org.apache.spark.sql.Encoders.scalaDouble)
    df.select((groupCols.map(col) :+ value.cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("__v")).as("qs"))
      .select((groupCols.map(col) :+
        posexplode(col("qs")).as(Seq("__i", "q_value"))): _*)
      .withColumn("p", element_at(
        array(ps.map(lit): _*), col("__i").cast("int") + 1))
      .select((groupCols.map(col) :+ col("p") :+ col("q_value")): _*)
  }

  def spaceSavingTopK(df: DataFrame, groupCols: Seq[String], item: Column,
      weight: Column, capacity: Int, k: Int): DataFrame = {
    val agg = udaf(new SpaceSavingAgg(capacity),
      org.apache.spark.sql.Encoders.product[StreamingTopK.ItemIn])
    df.select((groupCols.map(col) :+ item.cast("string").as("item") :+
        weight.cast("long").as("w")): _*)
      .filter(col("w").isNotNull && col("w") > 0L)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(lit(""), col("item"), col("w")).as("summary"))
      .select((groupCols.map(col) :+
        posexplode(slice(col("summary"), 1, k)).as(Seq("pos", "c"))): _*)
      .select((groupCols.map(col) :+
        (col("pos") + 1).cast("long").as("rank") :+
        col("c.item").as("item") :+ col("c.cnt").as("cnt") :+
        col("c.err").as("err")): _*)
  }

  /** Quantile estimate from the histogram: rank r = ceil(p*total), walk the
    * cumulative counts to the covering bucket, linear-interpolate inside
    * it. Exact to within one grid cell — the error bound is `width`, by
    * construction, independent of data size. */
  def histogramQuantile(cells: DataFrame, groupCols: Seq[String], p: Double,
      width: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val cum = grp.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__total", sum(col("n")).over(grp))
      .withColumn("__cum", sum(col("n")).over(cum))
      .withColumn("__rank",
        greatest(lit(1L), ceil(lit(p) * col("__total")).cast("long")))
      .filter(col("__cum") >= col("__rank"))
      .withColumn("__pick", row_number().over(grp.orderBy(col("bucket"))))
      .filter(col("__pick") === 1)
      .select((groupCols.map(col) :+
        (col("bucket").cast("double") * lit(width) + lit(width) *
          (col("__rank") - (col("__cum") - col("n"))).cast("double") /
          col("n").cast("double")).as("quantile_estimate")): _*)
  }
}
