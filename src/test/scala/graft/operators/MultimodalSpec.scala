package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.assetize(
    Seq((0L, "a" * 600), (1L, "hello world"), (2L, "x" * 256)).toDF("doc_id", "text"))

  test("assetize: binary content + deterministic media_type per id") {
    val rows = assets.collect().map(r =>
      r.getAs[Long]("asset_id") -> r.getAs[String]("media_type")).toMap
    assert(rows === Map(0L -> "image", 1L -> "audio", 2L -> "video"))
    val bytes = assets.filter($"asset_id" === 1L).head.getAs[Array[Byte]]("content")
    assert(new String(bytes, "UTF-8") === "hello world")
  }

  test("sampleFrames: ceil(n/256) frames per asset, stable digests") {
    val frames = Multimodal.sampleFrames(assets).collect()
      .groupBy(_.getAs[Long]("asset_id"))
    assert(frames(0L).length === 3) // 600 bytes -> 3 frames
    assert(frames(1L).length === 1)
    assert(frames(2L).length === 1)
    // frame 0 of asset 2 is exactly the 256-byte content -> md5 matches whole
    val whole = assets.filter($"asset_id" === 2L)
      .select(md5($"content")).head.getString(0)
    val f0 = frames(2L).find(_.getAs[Long]("frame_no") == 0L).get.getAs[String]("frame_md5")
    assert(f0 === whole)
  }

  test("decodeStub: deterministic dims in [64, 512), md5 matches content") {
    val d = Multimodal.decodeStub(assets).collect().map(r => r.asset_id -> r).toMap
    assert(d.size === 3)
    d.values.foreach { a =>
      assert(a.width >= 64 && a.width < 512)
      assert(a.height >= 64 && a.height < 512)
    }
    // same input -> same output (stub is pure)
    val d2 = Multimodal.decodeStub(assets).collect().map(r => r.asset_id -> r).toMap
    assert(d.mapValues(_.width).toMap === d2.mapValues(_.width).toMap)
    assert(d(1L).n_bytes === 11L)
  }

  test("resizeMeta caps the longest dimension, preserves aspect via scale") {
    val decoded = Multimodal.decodeStub(assets).toDF()
    val resized = Multimodal.resizeMeta(decoded, maxDim = 128).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    resized.values.foreach { r =>
      assert(r.getAs[Int]("width") <= 128 && r.getAs[Int]("height") <= 128)
      assert(r.getAs[Double]("scale") <= 1.0)
    }
  }
}
