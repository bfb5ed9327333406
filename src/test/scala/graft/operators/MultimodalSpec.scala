package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.assetize(
    Seq((0L, "a" * 600), (1L, "hello world"), (2L, "x" * 256)).toDF("doc_id", "text"))

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

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

  test("decode reads EXACT dimensions of a hand-crafted 13x7 PNG") {
    val img = new BufferedImage(13, 7, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 13) img.setRGB(x, y, 0x336699)
    val in = Seq(Multimodal.Asset(42L, "image", encode(img, "png"))).toDF()
    val d = Multimodal.decode(in).collect().head
    assert(d.width === 13)
    assert(d.height === 7)
    assert(d.channels === 3)
    assert(d.codec === "png")
    assert(d.decoded)
    assert(d.solid_rgb === 0x336699L)
  }

  test("decode detects non-uniform pixels (solid_rgb = -1) and other codecs") {
    val img = new BufferedImage(5, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, 0x102030)
    img.setRGB(3, 2, 0xffffff) // one off-colour pixel
    val bmp = new BufferedImage(9, 11, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 11; x <- 0 until 9) bmp.setRGB(x, y, 0xff0000)
    val in = Seq(
      Multimodal.Asset(1L, "image", encode(img, "png")),
      Multimodal.Asset(2L, "image", encode(bmp, "bmp")),
      Multimodal.Asset(3L, "image", encode(bmp, "gif"))).toDF()
    val d = Multimodal.decode(in).collect().map(r => r.asset_id -> r).toMap
    assert(d(1L).solid_rgb === -1L)
    assert((d(1L).width, d(1L).height) === (5, 4))
    assert(d(2L).codec === "bmp")
    assert((d(2L).width, d(2L).height) === (9, 11))
    assert(d(2L).solid_rgb === 0xff0000L)
    assert(d(3L).codec === "gif")
    assert((d(3L).width, d(3L).height) === (9, 11))
  }

  test("decode JPEG: dims + codec from a lossy write survive round-trip") {
    val img = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24) img.setRGB(x, y, 0x888888)
    val d = Multimodal.decode(
      Seq(Multimodal.Asset(7L, "image", encode(img, "jpg"))).toDF()).collect().head
    assert((d.width, d.height) === (24, 16))
    assert(d.codec === "jpeg")
    assert(d.decoded)
  }

  test("undecodable bytes fall back: decoded=false, hash dims in [64,512)") {
    val d = Multimodal.decode(assets).collect().map(r => r.asset_id -> r).toMap
    assert(d.size === 3)
    d.values.foreach { a =>
      assert(!a.decoded)          // ASCII text is not an image
      assert(a.codec === "none")
      assert(a.solid_rgb === -1L)
      assert(a.width >= 64 && a.width < 512)
      assert(a.height >= 64 && a.height < 512)
    }
    // same input -> same output (fallback is pure)
    val d2 = Multimodal.decode(assets).collect().map(r => r.asset_id -> r).toMap
    assert(d.view.mapValues(_.width).toMap === d2.view.mapValues(_.width).toMap)
    assert(d(1L).n_bytes === 11L)
  }

  test("withSyntheticImages: PNG bytes land only on image rows; decode " +
    "recovers the id-derived dims and fill colour") {
    val d = Multimodal.decode(Multimodal.withSyntheticImages(assets))
      .collect().map(r => r.asset_id -> r).toMap
    // asset 0 is the image row: real PNG, exact synthetic geometry
    assert(d(0L).decoded)
    assert(d(0L).codec === "png")
    assert(d(0L).width === Multimodal.syntheticWidth(0L))
    assert(d(0L).height === Multimodal.syntheticHeight(0L))
    assert(d(0L).solid_rgb === Multimodal.syntheticRgb(0L))
    assert(d(0L).channels === 3)
    // audio/video rows keep text bytes -> fallback
    assert(!d(1L).decoded && !d(2L).decoded)
    assert(d(1L).n_bytes === 11L)
    // a couple more ids through the pure fixture functions: PNG magic header
    val png = Multimodal.syntheticPng(123L)
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    assert(Multimodal.syntheticWidth(123L) === (8 + 123 % 56))
    assert(Multimodal.syntheticRgb(123L) ===
      ((123L * 7 + 1) % 256) * 65536 + ((123L * 13 + 3) % 256) * 256 + (123L * 29 + 5) % 256)
  }

  test("pixelFeatures: exact channel means on a crafted non-uniform image") {
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xff0000)
    val in = Seq(
      Multimodal.Asset(1L, "image", encode(img, "png")),
      Multimodal.Asset(2L, "audio", "not an image".getBytes("UTF-8"))).toDF()
    val f = Multimodal.pixelFeatures(in).collect().map(r => r.asset_id -> r).toMap
    assert(f(1L).decoded && (f(1L).width, f(1L).height) === (2, 1))
    assert(f(1L).mean_r === 127.5 && f(1L).mean_g === 0.0 && f(1L).mean_b === 0.0)
    assert(!f(2L).decoded && f(2L).mean_r === -1.0)
  }

  test("resizePixels: real resample to capped dims; small and opaque assets pass through") {
    val big = new BufferedImage(30, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 30) big.setRGB(x, y, 0x224466)
    val small = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) small.setRGB(x, y, 0x112233)
    val smallBytes = encode(small, "png")
    val opaque = "definitely not an image".getBytes("UTF-8")
    val in = Seq(
      Multimodal.Asset(1L, "image", encode(big, "png")),
      Multimodal.Asset(2L, "image", smallBytes),
      Multimodal.Asset(3L, "video", opaque)).toDF()
    val out = Multimodal.resizePixels(in, maxDim = 15).collect()
      .map(a => a.asset_id -> a).toMap
    val d = Multimodal.decode(Seq(out(1L)).toDF()).collect().head
    assert((d.width, d.height) === (15, 5)) // floor(30*0.5), floor(10*0.5)
    assert(d.solid_rgb === 0x224466L, "bilinear over a solid fill stays solid")
    assert(out(2L).content.toSeq === smallBytes.toSeq, "small image untouched")
    assert(out(3L).content.toSeq === opaque.toSeq, "opaque blob untouched")
  }

  test("decodeFrames: every frame of a crafted animated GIF, exact colours; sentinel for opaque") {
    val gif = Multimodal.syntheticGif(11L) // 5 frames (2 + 11%4)
    val in = Seq(
      Multimodal.Asset(11L, "video", gif),
      Multimodal.Asset(12L, "video", "not a container".getBytes("UTF-8"))).toDF()
    val rows = Multimodal.decodeFrames(in).collect()
    val v = rows.filter(_.asset_id == 11L).sortBy(_.frame_no)
    assert(v.length === 5)
    v.zipWithIndex.foreach { case (fr, i) =>
      assert(fr.n_frames === 5)
      assert(fr.frame_no === i.toLong)
      assert(fr.codec === "gif")
      assert((fr.width, fr.height) ===
        (Multimodal.syntheticWidth(11L), Multimodal.syntheticHeight(11L)))
      assert(fr.solid_rgb === Multimodal.syntheticFrameRgb(11L, i),
        s"frame $i colour must round-trip the GIF palette exactly")
    }
    val sentinel = rows.filter(_.asset_id == 12L)
    assert(sentinel.length === 1)
    assert(sentinel.head.n_frames === 0 && sentinel.head.frame_no === -1L)
    // single-frame stills also flow through the frame API (n_frames = 1)
    val still = Multimodal.decodeFrames(
      Seq(Multimodal.Asset(5L, "image", Multimodal.syntheticPng(5L))).toDF()).collect()
    assert(still.length === 1 && still.head.n_frames === 1)
    assert(still.head.solid_rgb === Multimodal.syntheticRgb(5L))
  }

  test("decodeAudio: WAV round-trip is sample-exact; corrupt bytes get a sentinel") {
    val id = 7L
    val wav = Multimodal.syntheticWav(id)
    // WAV magic: RIFF....WAVE
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val in = Seq(
      Multimodal.Asset(id, "audio", wav),
      Multimodal.Asset(8L, "audio", "white noise this is not".getBytes("UTF-8"))).toDF()
    val d = Multimodal.decodeAudio(in).collect().map(r => r.asset_id -> r).toMap
    val n = Multimodal.syntheticSampleCount(id)
    val expectSamples = (0L until n.toLong).map(k => Multimodal.syntheticSample(id, k))
    assert(d(id).decoded)
    assert(d(id).sample_rate === Multimodal.AudioSampleRate)
    assert((d(id).channels, d(id).bits) === (1, 16))
    assert(d(id).n_samples === n.toLong)
    assert(d(id).duration_ms === n.toLong * 1000 / Multimodal.AudioSampleRate)
    assert(d(id).peak_abs === expectSamples.map(s => math.abs(s.toLong)).max)
    assert(d(id).sum_abs === expectSamples.map(s => math.abs(s.toLong)).sum)
    assert(!d(8L).decoded && d(8L).peak_abs === -1L && d(8L).n_samples === 0L)
  }

  test("resizeMeta caps the longest dimension, preserves aspect via scale") {
    val decoded = Multimodal.decode(assets).toDF()
    val resized = Multimodal.resizeMeta(decoded, maxDim = 128).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    resized.values.foreach { r =>
      assert(r.getAs[Int]("width") <= 128 && r.getAs[Int]("height") <= 128)
      assert(r.getAs[Double]("scale") <= 1.0)
    }
  }

  test("imageAHash: one white pixel in an 8x8 black raster sets exactly that bit") {
    // 8x8 raster = one pixel per aHash cell, so the hash is hand-derivable:
    // the white cell (gray 765) strictly exceeds the global mean (765/64),
    // every black cell (0) does not -> hash = 1L << (row*8 + col).
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 3, 0xffffff) // col 5, row 3 -> bit 29
    val in = Seq(Multimodal.Asset(1L, "image", encode(img, "png"))).toDF()
    val h = Multimodal.imageAHash(in).collect().head
    assert(h.decoded)
    assert(h.ahash === (1L << 29))
  }

  test("imageAHash: pattern fixture hash equals bandPattern XOR accent bit") {
    val ids = Seq(0L, 3L, 17L, 41L, 62L, 123L)
    val in = ids.map(id =>
      Multimodal.Asset(id, "image", Multimodal.syntheticPatternPng(id))).toDF()
    val got = Multimodal.imageAHash(in).collect().map(h => h.asset_id -> h.ahash).toMap
    ids.foreach { id =>
      val band = ((1L << Multimodal.patternBandCols(id)) - 1) * 0x0101010101010101L
      val expect = band ^ (1L << Multimodal.patternAccentPos(id))
      assert(got(id) === expect, s"id=$id")
    }
  }

  test("imageAHash: undecodable content flags decoded=false with ahash 0") {
    val in = Seq(Multimodal.Asset(9L, "image", "not an image".getBytes("UTF-8"))).toDF()
    val h = Multimodal.imageAHash(in).collect().head
    assert(!h.decoded)
    assert(h.ahash === 0L)
  }

  test("audioFingerprint: hand-derivable two-window fingerprint from a real WAV") {
    // 4 samples, 2 windows: energies |10|+|20|=30 and |-40|+|5|=45 ->
    // E1 > E0 -> fingerprint = 1 (bit 0 only)
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = Seq[Short](10, 20, -40, 5)
    val pcm = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val in = Seq(Multimodal.Asset(7L, "audio", bos.toByteArray)).toDF()
    val f = Multimodal.audioFingerprint(in, windows = 2).collect().head
    assert(f.decoded)
    assert(f.n_samples === 4L)
    assert(f.fingerprint === 1L)
  }

  test("audioFingerprint: variant WAV matches the integer formula; corrupt flags") {
    // fingerprint recomputed locally from variantSample arithmetic must
    // equal what the decoder reads back out of the real WAV container
    val ids = Seq(1L, 4L, 22L, 37L)
    val in = ids.map(id =>
      Multimodal.Asset(id, "audio", Multimodal.syntheticWavVariant(id))).toDF()
    val got = Multimodal.audioFingerprint(in).collect()
      .map(f => f.asset_id -> f).toMap
    ids.foreach { id =>
      val n = Multimodal.variantSampleCount(id)
      val energy = Array.tabulate(64) { w =>
        ((w.toLong * n / 64).toInt until ((w + 1).toLong * n / 64).toInt)
          .map(k => math.abs(Multimodal.variantSample(id, k.toLong).toLong)).sum
      }
      val expect = (0 until 63).foldLeft(0L) { (acc, w) =>
        if (energy(w + 1) > energy(w)) acc | (1L << w) else acc
      }
      assert(got(id).decoded && got(id).n_samples === n.toLong)
      assert(got(id).fingerprint === expect, s"id=$id")
    }
    val bad = Seq(Multimodal.Asset(99L, "audio", "nope".getBytes("UTF-8"))).toDF()
    val b = Multimodal.audioFingerprint(bad).collect().head
    assert(!b.decoded && b.fingerprint === 0L)
  }

  test("audio variants of one base track land within hamming 3; " +
      "different bases stay apart") {
    // ids 1,4,7,10 are the 4 variants of base 0; 13,16 belong to base 1
    val ids = Seq(1L, 4L, 7L, 10L, 13L, 16L)
    val in = ids.map(id =>
      Multimodal.Asset(id, "audio", Multimodal.syntheticWavVariant(id))).toDF()
    val fps = Multimodal.audioFingerprint(in).collect()
      .map(f => f.asset_id -> f.fingerprint).toMap
    val sameBase = for (Seq(a, b) <- Seq(1L, 4L, 7L, 10L).combinations(2).toSeq)
      yield java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(sameBase.forall(_ <= 3), s"same-base hammings: $sameBase")
    val crossBase = for (a <- Seq(1L, 4L, 7L, 10L); b <- Seq(13L, 16L))
      yield java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(crossBase.forall(_ > 3), s"cross-base hammings: $crossBase")
  }

  test("videoFingerprint: per-frame hashes of a pattern GIF match the formula; " +
      "corrupt flags a sentinel row") {
    val ids = Seq(2L, 5L, 14L, 26L)
    val in = (ids.map(id =>
        Multimodal.Asset(id, "video", Multimodal.syntheticPatternGif(id))) :+
      Multimodal.Asset(99L, "video", "static".getBytes("UTF-8"))).toDF()
    val got = Multimodal.videoFingerprint(in).collect()
      .groupBy(_.asset_id)
    ids.foreach { id =>
      val b = Multimodal.videoVariantBase(id)
      val v = Multimodal.videoVariantNo(id)
      val nf = Multimodal.videoVariantFrameCount(id)
      val fs = got(id).sortBy(_.frame_no)
      assert(fs.length === nf && fs.forall(f => f.decoded && f.n_frames === nf))
      fs.zipWithIndex.foreach { case (fh, f) =>
        val band = ((1L << (1 + (b * 5 + f) % 7)) - 1) * 0x0101010101010101L
        val expect = band ^ (1L << ((b * 7 + f * 11 + v * 13) % 63))
        assert(fh.ahash === expect, s"id=$id frame=$f")
      }
    }
    val bad = got(99L).head
    assert(!bad.decoded && bad.n_frames === 0 && bad.frame_no === -1L)
  }

  test("frameSequencePairs: same-base variants pair at max_hamming 2; " +
      "different length or far frames never pair") {
    // base 0 variants: 2,5,8,11 (nf=2); base 1 variants: 14,17,20,23 (nf=3)
    val ids = Seq(2L, 5L, 8L, 11L, 14L, 17L, 20L, 23L)
    val in = ids.map(id =>
      Multimodal.Asset(id, "video", Multimodal.syntheticPatternGif(id))).toDF()
    val fh = Multimodal.videoFingerprint(in).toDF().filter($"decoded")
    val got = Dedup.frameSequencePairs(fh, maxHamming = 2).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("n_frames"), r.getAs[Int]("max_hamming"))).toSet
    val expect = (for {
      grp <- Seq(Seq(2L, 5L, 8L, 11L), Seq(14L, 17L, 20L, 23L))
      Seq(a, b) <- grp.combinations(2).toSeq
    } yield (a, b, if (grp.head == 2L) 2 else 3, 2)).toSet
    assert(got === expect)
  }

  test("signatureHammingPairs over aHash recovers exactly the brute-force " +
      "hamming<=2 pair set on pattern images") {
    val ids = (0L until 40L).toSeq
    val in = ids.map(id =>
      Multimodal.Asset(id, "image", Multimodal.syntheticPatternPng(id))).toDF()
    val hashes = Multimodal.imageAHash(in).toDF().filter($"decoded")
    val got = Dedup.signatureHammingPairs(hashes, "asset_id", "ahash",
        blocks = 4, maxHamming = 2)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    val local = hashes.collect().map(r =>
      r.getAs[Long]("asset_id") -> r.getAs[Long]("ahash"))
    val brute = (for {
      (ia, ha) <- local; (ib, hb) <- local if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got === brute)
    assert(brute.nonEmpty) // same-band ids exist in 0..39 (7 band values)
    // and every pair's members share a band (the fixture's semantic claim)
    brute.foreach { case (a, b, _) =>
      assert(Multimodal.patternBandCols(a) === Multimodal.patternBandCols(b))
    }
  }
}
