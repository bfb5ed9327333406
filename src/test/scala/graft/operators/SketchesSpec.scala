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
}
