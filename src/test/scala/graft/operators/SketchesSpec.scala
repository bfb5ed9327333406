package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val B = 10 // 1024 registers keeps the spec fast

  test("hll estimate lands within the theoretical error band (5k distinct)") {
    val items = (1 to 5000).map(i => s"item-$i").toDF("x")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(items.withColumn("g", lit(1)), Seq("g"), $"x", B),
      Seq("g"), B)
      .collect().head.getAs[Double]("hll_estimate")
    // sigma = 1.04/sqrt(m) ~ 3.25% at m=1024; 4 sigma is a safe spec bound
    assert(math.abs(est - 5000) / 5000.0 < 0.13, s"estimate $est too far from 5000")
  }

  test("hll registers are duplicate-insensitive and mergeable by max") {
    val once = (1 to 500).map(i => s"v$i").toDF("x").withColumn("g", lit(1))
    val thrice = (1 to 3).flatMap(_ => (1 to 500).map(i => s"v$i")).toDF("x")
      .withColumn("g", lit(1))
    val r1 = Sketches.hllRegisters(once, Seq("g"), $"x", B)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val r3 = Sketches.hllRegisters(thrice, Seq("g"), $"x", B)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(r1 === r3, "duplicates must not move any register")

    // shard-and-merge equals whole: max-combine the half sketches
    val (a, b) = ((1 to 250).map(i => s"v$i"), (251 to 500).map(i => s"v$i"))
    val merged = Sketches.hllRegisters(a.toDF("x").withColumn("g", lit(1)), Seq("g"), $"x", B)
      .unionByName(Sketches.hllRegisters(b.toDF("x").withColumn("g", lit(1)), Seq("g"), $"x", B))
      .groupBy($"g", $"bucket").agg(max($"register").as("register"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(merged === r1, "half-sketches max-merged must equal the whole sketch")
  }

  test("cms never undercounts; no-collision fixture is exact; unseen reads 0") {
    val data = (Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma"))
      .toDF("x")
    val cells = Sketches.cmsCells(data, Seq.empty, $"x", d = 4, w = 2048)
    val probes = Seq("alpha", "beta", "gamma", "never-seen").toDF("x")
    val got = Sketches.cmsQuery(cells, Seq.empty, probes, $"x", d = 4, w = 2048)
      .collect().map(r => r.getAs[String]("__item") -> r.getAs[Long]("cms_estimate"))
      .toMap
    // 3 items in 2048 columns: collision probability negligible in all 4 rows
    assert(got === Map("alpha" -> 40L, "beta" -> 7L, "gamma" -> 1L,
      "never-seen" -> 0L))
  }

  test("cms cells are mergeable by sum") {
    val h1 = Seq.fill(10)("k").toDF("x")
    val h2 = Seq.fill(5)("k").toDF("x")
    val merged = Sketches.cmsCells(h1, Seq.empty, $"x", 4, 256)
      .unionByName(Sketches.cmsCells(h2, Seq.empty, $"x", 4, 256))
      .groupBy($"r", $"c").agg(sum($"n").as("n"))
    val est = Sketches.cmsQuery(merged, Seq.empty, Seq("k").toDF("x"), $"x", 4, 256)
      .collect().head.getAs[Long]("cms_estimate")
    assert(est === 15L)
  }

  test("histogram quantile is within one cell width of the exact percentile") {
    // skewed fixture: heavy mass at low values plus a long tail
    val vals = ((1 to 900).map(i => (i % 50).toDouble) ++
      (1 to 100).map(i => (i * 7 % 400).toDouble)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = vals.toDF("id", "v").withColumn("g", lit(1))
    val w = 8.0
    val cells = Sketches.histogramCells(df, Seq("g"), $"v", w, 64)
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val est = Sketches.histogramQuantile(cells, Seq("g"), p, w)
        .collect().head.getAs[Double]("quantile_estimate")
      val exact = df.agg(expr(s"percentile(v, $p)")).head.getDouble(0)
      assert(math.abs(est - exact) <= w,
        s"p=$p: estimate $est vs exact $exact exceeds cell width $w")
    }
  }

  test("histogram cells merge by sum: sharded build equals whole build") {
    val all = (1 to 1000).map(i => (i.toLong, (i % 97).toDouble)).toDF("id", "v")
      .withColumn("g", lit(1))
    val (a, b) = ((1 to 500), (501 to 1000))
    def shard(r: Range) = Sketches.histogramCells(
      r.map(i => (i.toLong, (i % 97).toDouble)).toDF("id", "v")
        .withColumn("g", lit(1)), Seq("g"), $"v", 4.0, 32)
    val merged = shard(a).unionByName(shard(b))
      .groupBy($"g", $"bucket").agg(sum($"n").as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val whole = Sketches.histogramCells(all, Seq("g"), $"v", 4.0, 32)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("histogram clamps overflow values into the top bucket") {
    val df = Seq((1L, 5.0), (2L, 1e9)).toDF("id", "v").withColumn("g", lit(1))
    val buckets = Sketches.histogramCells(df, Seq("g"), $"v", 10.0, 16)
      .collect().map(_.getLong(1)).sorted
    assert(buckets === Array(0L, 15L))
  }

  // ------------------------------------------------ SpaceSaving (batch)

  private def ssAgg(cap: Int) = new Sketches.SpaceSavingAgg(cap)

  private def bufOf(agg: Sketches.SpaceSavingAgg, items: Seq[(String, Long)]) =
    items.foldLeft(agg.zero)((b, iw) =>
      agg.reduce(b, StreamingTopK.ItemIn("g", iw._1, iw._2)))

  test("SpaceSavingAgg: under-capacity merge is the exact count union") {
    val agg = ssAgg(16)
    val a = bufOf(agg, Seq("x" -> 3L, "y" -> 2L))
    val b = bufOf(agg, Seq("y" -> 5L, "z" -> 1L))
    val got = agg.finish(agg.merge(a, b)).map(c => (c.item, c.cnt, c.err))
    assert(got === Seq(("y", 7L, 0L), ("x", 3L, 0L), ("z", 1L, 0L)))
  }

  test("SpaceSavingAgg: absent-from-EVICTED side gets its min bound; " +
    "absent-from-full-but-exact side gets 0") {
    val agg = ssAgg(2)
    // a evicts: p->10, q->2, then r arrives at capacity -> q(2) evicted,
    // r enters as (cnt=3, err=2); minA = 3 and a.evicted = true
    val a = bufOf(agg, Seq("p" -> 10L, "q" -> 2L, "r" -> 1L))
    assert(a.evicted)
    // b reaches capacity with exactly 2 distinct items -> still EXACT
    val b = bufOf(agg, Seq("p" -> 6L, "r" -> 5L))
    assert(!b.evicted)
    val m = agg.merge(a, b).counters.map(c => c.item -> ((c.cnt, c.err))).toMap
    // p common: 10+6, err 0+0; r: (3, err 2) + (5, 0). Nothing absent from
    // only-b pays a floor (b never evicted), so no phantom min-counter mass.
    assert(m === Map("p" -> ((16L, 0L)), "r" -> ((8L, 2L))))
  }

  test("SpaceSavingAgg: vocabulary EXACTLY == capacity stays exact through merges") {
    // the r10-advice case: both sides full but never evicted — the merge
    // floor must NOT inflate items absent from one side
    val agg = ssAgg(2)
    val a = bufOf(agg, Seq("x" -> 3L, "y" -> 2L))
    val b = bufOf(agg, Seq("y" -> 5L, "z" -> 1L))
    val merged = agg.merge(a, b)
    val m = merged.counters.map(c => c.item -> ((c.cnt, c.err))).toMap
    assert(m === Map("y" -> ((7L, 0L)), "x" -> ((3L, 0L))))
    // the union overflowed capacity, so the pruned result IS now evicted:
    // a later merge must apply this side's min bound
    assert(merged.evicted)
  }

  test("SpaceSavingAgg: guarantees hold on adversarial random merge trees") {
    val rnd = new scala.util.Random(5)
    val items = (1 to 400).map(_ => s"i${rnd.nextInt(30)}") ++ Seq.fill(120)("HOT")
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    val cap = 8
    val agg = ssAgg(cap)
    // random partitioning into 7 buffers, random pairwise merge order
    val shuffled = rnd.shuffle(items)
    var bufs = shuffled.grouped(80).map(g => bufOf(agg, g.map(_ -> 1L))).toVector
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      bufs = bufs.patch(i, Seq(agg.merge(bufs(i), bufs(i + 1))), 2)
    }
    val fin = agg.finish(bufs.head)
    val byItem = fin.map(c => c.item -> c).toMap
    assert(byItem.contains("HOT"), "count > N/capacity must survive any merge tree")
    fin.foreach { c =>
      val t = truth.getOrElse(c.item, 0L)
      assert(c.cnt >= t, s"underestimate: $c true=$t")
      assert(c.cnt - c.err <= t, s"error bound broken: $c true=$t")
    }
  }

  test("QuantileAgg: exact rank selection while n <= capacity, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (1 to 200).map(_ => rnd.nextInt(1000).toDouble)
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val sorted = vals.sorted
    def exactQ(p: Double): Double =
      sorted(math.ceil(p * vals.size).toLong.max(1L).toInt - 1)
    for (parts <- Seq(1, 7)) {
      val got = Sketches.quantileSummary(
          vals.map(("g", _)).toDF("g", "v").repartition(parts),
          Seq("g"), $"v", capacity = 256, ps = ps)
        .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
      assert(got === ps.map(p => p -> exactQ(p)).toMap,
        s"exact mode must be partitioning-independent (parts=$parts)")
    }
  }

  test("QuantileAgg: compressed-mode rank error within the documented bound, adversarial merge trees") {
    val n = 4096
    val m = 64
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val agg = new Sketches.QuantileAgg(m, ps)
    // documented bound: rank error <= n * ceil(log2(2n/m)) / m
    val bound = n.toLong * math.ceil(
      math.log(2.0 * n / m) / math.log(2.0)).toLong / m
    def rankErr(data: Seq[Double], est: Double, p: Double): Long = {
      val s = data.sorted
      val target = math.ceil(p * data.size).toLong.max(1L)
      val lo = s.count(_ < est) + 1L // v occupies rank interval [lo, hi]
      val hi = s.count(_ <= est).toLong
      if (target < lo) lo - target else if (target > hi) target - hi else 0L
    }
    def check(data: Seq[Double], how: String, finBuf: Sketches.QsBuf): Unit = {
      val est = agg.finish(finBuf)
      ps.zip(est).foreach { case (p, v) =>
        val err = rankErr(data, v, p)
        assert(err <= bound,
          s"$how: p=$p est=$v rank error $err > bound $bound (n=$n m=$m)")
      }
    }
    def bufOf(data: Seq[Double]): Sketches.QsBuf =
      data.foldLeft(agg.zero)(agg.reduce)
    // sequential inserts on sorted ascending / descending (the adversarial
    // orders for deterministic compactors) and shuffled
    val asc = (1 to n).map(_.toDouble)
    check(asc, "ascending", bufOf(asc))
    check(asc, "descending", bufOf(asc.reverse))
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(asc)
    check(asc, "shuffled", bufOf(shuffled))
    // random partitioning, random pairwise merge order (SpaceSaving's
    // adversarial-tree harness)
    var bufs = rnd.shuffle(asc).grouped(300).map(bufOf).toVector
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      bufs = bufs.patch(i, Seq(agg.merge(bufs(i), bufs(i + 1))), 2)
    }
    check(asc, "random merge tree", bufs.head)
    // total weight is ALWAYS exact (compactions preserve it)
    val w = bufs.head.levels.zipWithIndex
      .map { case (items, l) => items.size.toLong << l }.sum
    assert(w === n.toLong, "compaction must preserve total weight")
  }

  test("spaceSavingTopK: exact with distinct items == capacity, any partitioning") {
    import spark.implicits._
    // every group sees exactly 12 distinct items and capacity is 12: the
    // summary must remain the exact count map (no eviction ever happens)
    val rows = for (g <- Seq("a", "b"); t <- 0 until 12; _ <- 0 to t)
      yield (g, s"t$t")
    val df = rows.toDF("source", "item")
    for (parts <- Seq(1, 5)) {
      val got = Sketches.spaceSavingTopK(df.repartition(parts), Seq("source"),
          org.apache.spark.sql.functions.col("item"),
          org.apache.spark.sql.functions.lit(1L), capacity = 12, k = 12)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("item"),
          r.getAs[Long]("cnt"), r.getAs[Long]("err")))
      assert(got.length === 24)
      got.foreach { case (_, i, cnt, err) =>
        assert(cnt === i.drop(1).toLong + 1, s"item $i")
        assert(err === 0L, s"item $i must stay exact at vocabulary == capacity")
      }
    }
  }

  test("spaceSavingTopK: exact mode matches a plain groupBy across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ => (s"s${rnd.nextInt(3)}", s"t${rnd.nextInt(12)}"))
    val df = rows.toDF("source", "item")
    val exact = rows.groupBy(identity).map { case ((s, i), v) => (s, i) -> v.size.toLong }
    for (parts <- Seq(1, 7)) {
      val got = Sketches.spaceSavingTopK(df.repartition(parts), Seq("source"),
          org.apache.spark.sql.functions.col("item"),
          org.apache.spark.sql.functions.lit(1L), capacity = 64, k = 3)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
          r.getAs[String]("item"), r.getAs[Long]("cnt"), r.getAs[Long]("err")))
      got.foreach { case (s, _, i, cnt, err) =>
        assert(cnt === exact((s, i))); assert(err === 0L)
      }
      // rank agrees with (cnt desc, item) over the exact counts
      got.groupBy(_._1).foreach { case (s, rs) =>
        val expect = exact.collect { case ((`s`, i), c) => (i, c) }.toSeq
          .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1)
        assert(rs.sortBy(_._2).map(_._3).toSeq === expect, s"source $s")
      }
    }
  }
}
