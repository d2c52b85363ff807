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

  /** File extension ↔ media type for [[ingestBinary]]'s path parsing
    * (the reference analog: opaque API blobs typed by endpoint,
    * backfill_user_profiles.py:144-153). */
  val ExtToType: Map[String, String] =
    Map("mp4" -> "video", "img" -> "image", "wav" -> "audio")

  /** REAL binary ingestion: `spark.read.format("binaryFile")` over a
    * directory of media blobs named `asset_<id>.<ext>`. This is the
    * production source side of the tier — each file is an opaque
    * payload; id and type come from the path, not the bytes, so no
    * decode happens at scan time. Scale: binaryFile assigns whole
    * files to partitions (a blob never splits), so partition count
    * tracks file count; set `maxPartitionBytes`/use a manifest compact
    * step for many-small-files corpora. Files with names outside the
    * convention are dropped (null id — the explicit filter). */
  def ingestBinary(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    val typeExpr = ExtToType.foldLeft(lit(null).cast("string")) {
      case (acc, (ext, t)) => when(col("__ext") === ext, lit(t))
        .otherwise(acc)
    }
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "asset_(\\d+)\\.([a-z0-9]+)$", 1)
          .as("__id"),
        regexp_extract(col("path"), "asset_(\\d+)\\.([a-z0-9]+)$", 2)
          .as("__ext"),
        col("content").as("payload"))
      .filter(col("__id") =!= "")
      .select(col("__id").cast("long").as("asset_id"),
        typeExpr.as("media_type"), col("payload"))
      // a >19-digit id matches the regex but overflows the long cast
      // to NULL — drop it with the other nonconforming names instead
      // of surfacing a null primitive in Dataset[MediaAsset]
      .filter(col("media_type").isNotNull && col("asset_id").isNotNull)
      .as[MediaAsset]
  }

  /** Exact media dedup by payload identity: group on (xxhash64, bytes)
    * — the hash co-locates candidates cheaply (8-byte shuffle key next
    * to megabyte payloads), the byte-equality grouping makes the
    * result collision-proof. Returns one row per distinct payload:
    * (canonical_id = min member, n_bytes, n_copies, member_ids). At
    * 100 TB, run the same shape in two passes — group by hash first,
    * then byte-verify only multi-member hash groups — so single-copy
    * payloads (the vast majority) never shuffle their bytes. */
  def dedupExactMedia(assets: Dataset[MediaAsset]): DataFrame =
    assets.toDF()
      .groupBy(xxhash64(col("payload")).as("__h"), col("payload"))
      .agg(min("asset_id").as("canonical_id"),
        count(lit(1)).as("n_copies"),
        array_join(sort_array(collect_list(col("asset_id")))
          .cast("array<string>"), ",").as("member_ids"))
      .select(col("canonical_id"), length(col("payload")).as("n_bytes"),
        col("n_copies"), col("member_ids"))
}
