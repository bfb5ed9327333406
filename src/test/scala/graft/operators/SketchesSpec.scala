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
}
