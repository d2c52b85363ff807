package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface): image/audio/video
  * as opaque binary columns with typed metadata, processed in batches
  * via `mapPartitions` (the Scala analog of `mapInPandas` — one decoder
  * instantiation per partition, streamed row batches).
  *
  * The actual media decode is STUBBED (this container has no image or
  * audio libraries): [[StubDecoder]] derives deterministic fake
  * dimensions from the byte payload. Everything Spark-side — the binary
  * schema, the typed Dataset signature, per-partition batching, the
  * frame-sampling shape — is real and tested; swapping in a JNI/FFmpeg
  * decoder changes only [[MediaDecoder.decode]].
  */
object Multimodal {

  /** An opaque media asset: payload + typed metadata. */
  case class MediaAsset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata (what a real image/video decoder would emit). */
  case class DecodedMeta(asset_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, n_sampled_frames: Int)

  /** The decoder seam. A production implementation wraps a native
    * library; the stub is pure arithmetic on the payload length. */
  trait MediaDecoder extends Serializable {
    def decode(a: MediaAsset): DecodedMeta
  }

  /** Deterministic fake: dimensions derived from byte length; frame
    * sampling keeps every 5th frame (the real pipeline's stride). */
  object StubDecoder extends MediaDecoder {
    def decode(a: MediaAsset): DecodedMeta = {
      val n = a.payload.length
      val w = n % 640 + 1
      val h = (n * 7) % 480 + 1
      val frames = if (a.media_type == "video") n % 30 + 1 else 1
      DecodedMeta(a.asset_id, a.media_type, n, w, h, frames,
        (frames + 4) / 5)
    }
  }

  /** Batch decode: one decoder per partition (the expensive init a real
    * codec needs happens once per partition, not per row). */
  def decodeMeta(assets: Dataset[MediaAsset],
      decoder: MediaDecoder = StubDecoder): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val d = decoder // per-partition init point
      it.map(d.decode)
    }
  }

  /** Build a MediaAsset dataset from any (id, text) source by encoding
    * the text as a binary payload — the offline stand-in for reading
    * real image bytes (binaryFile source in production). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String)
      (implicit s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    df.select(
        col(idCol).cast("long").as("asset_id"),
        when(col(idCol) % 3 === 0, lit("video"))
          .when(col(idCol) % 3 === 1, lit("image"))
          .otherwise(lit("audio")).as("media_type"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaAsset]
  }
}
