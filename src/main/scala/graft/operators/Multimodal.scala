package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * content plus typed metadata, with decode / feature-extract / frame-sample
  * as distributed operators.
  *
  * Plumbing is real — schemas, partitioning, batch shapes, the
  * mapPartitions decoder loop — but the actual codec is a clearly-marked
  * deterministic STUB (`decodeStub`): this container ships no image/audio
  * libraries, so the stub derives "decoded" properties from a content hash.
  * Swapping in a real decoder changes ONE function body and nothing else.
  *
  * The documents fixture doubles as the asset corpus (ASCII text cast to
  * bytes), which keeps every byte-level operator oracle-checkable from SQL.
  */
object Multimodal {

  val FrameBytes = 256

  final case class Asset(asset_id: Long, media_type: String, content: Array[Byte])

  final case class DecodedAsset(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      content_md5: String)

  /** Adapt any (id, text) table into a typed asset table: binary content +
    * media-type metadata (deterministic assignment across the 3 modalities). */
  def assetize(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("content"))

  /** Byte-level features (map-only, codegen'd): size, content hash, magic
    * prefix, per-frame digest of the first frame. */
  def byteFeatures(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("media_type"),
      length(col("content")).as("n_bytes"),
      md5(col("content")).as("content_md5"),
      lower(hex(substring(col("content"), 1, 8))).as("magic_hex"),
      md5(substring(col("content"), 1, FrameBytes)).as("frame0_md5"))

  /** Frame sampling: one output row per FrameBytes-sized slice — the
    * shuffle-free explode shape a video pipeline uses for per-frame work.
    * Slices are taken with substring on the binary column (no per-element
    * lambda; codegen'd), one row per (asset, frame). */
  def sampleFrames(assets: DataFrame, frameBytes: Int = FrameBytes): DataFrame = {
    val nFrames = ceil(length(col("content")) / lit(frameBytes.toDouble)).cast("long")
    assets
      .select(col("asset_id"),
        posexplode(when(nFrames > 0, transform(
          sequence(lit(0L), nFrames - 1),
          // `content` inside the lambda is an attribute read (not a
          // recomputed subtree) — safe, unlike captured computed exprs
          i => md5(col("content").substr((i * frameBytes + 1).cast("int"), lit(frameBytes)))))
          .otherwise(array().cast("array<string>"))))
      .select(col("asset_id"), col("pos").cast("long").as("frame_no"),
        col("col").as("frame_md5"))
  }

  /** STUB DECODER — deterministic fake in place of a real codec.
    * Runs as mapPartitions over the typed Dataset: per partition you would
    * initialize the codec once (like a per-partition connection) and loop
    * over assets; here the "decode" derives width/height from the first two
    * bytes of the content's MD5, so the oracle can replicate it in SQL.
    * Replace THIS body with javax.imageio / ffmpeg bindings in production. */
  def decodeStub(assets: DataFrame): Dataset[DecodedAsset] = {
    val ds = assets.select(col("asset_id"), col("media_type"), col("content"))
      .as(Encoders.product[Asset])
    ds.mapPartitions { it =>
      // per-partition init (real codecs are expensive to construct)
      val md = MessageDigest.getInstance("MD5")
      it.map { a =>
        md.reset()
        val digest = md.digest(a.content).map("%02x".format(_)).mkString
        val h16 = Integer.parseInt(digest.substring(0, 4), 16)
        DecodedAsset(
          asset_id = a.asset_id,
          media_type = a.media_type,
          n_bytes = a.content.length.toLong,
          width = 64 + h16 % 448,
          height = 64 + (h16 / 448) % 448,
          content_md5 = digest)
      }
    }(Encoders.product[DecodedAsset])
  }

  /** "Resize": metadata-level transform over the decoded table — the shape
    * of a real resize (recompute dims, keep lineage), sans pixels. */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    decoded.select(col("asset_id"), col("media_type"),
      floor(col("width") * scale).cast("int").as("width"),
      floor(col("height") * scale).cast("int").as("height"),
      round(scale, 6).as("scale"))
  }
}
