package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column conformance queries: binary ingestion via the
  * `binaryFile` source, header-real image metadata decode (PNG/JPEG/GIF
  * byte arithmetic — [[graft.multimodal.Multimodal.HeaderDecoder]]),
  * the codec-stub decode seam, and exact media dedup. Fixture files are
  * planted from the documents table, so every oracle re-derives the
  * expected bytes/dimensions from the same planting formula and the
  * whole binaryFile read-back path is hash-checked, not just
  * row-counted.
  */
object MultimodalOps extends QueryModule {

  // The codec-stub decode path (fake video/audio blobs): text bytes
  // carry no image header, so HeaderDecoder falls through to the
  // deterministic stub — the seam a real FFmpeg decoder would fill.
  private def mmDecodeMeta(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.decodeMeta(
        Multimodal.assetsFromText(Tables.documents(s, d), "doc_id", "text"))
      .toDF()
      .orderBy("asset_id")
  }

  /** Plant REAL image files once per (session, dir): every 25th doc
    * becomes `asset_<id>.png` (JPEG for every 50th) whose header
    * encodes width = id%640+1, height = id*7%480+1 via
    * [[Multimodal.MediaHeaders]] — valid PNG IHDR / JPEG SOF0 bytes,
    * dimensions derivable from doc_id in the DuckDB oracle. The text
    * bytes ride after the header so payload sizes vary organically. */
  private def imageFixtureDir(s: SparkSession, d: String): String =
    SessionMemo(s, d, "mm_image_fixtures") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_img_" +
        java.lang.Integer.toHexString(d.hashCode)
      val bp = java.nio.file.Paths.get(base)
      graft.sources.TableSwap.deleteRecursively(bp)
      java.nio.file.Files.createDirectories(bp)
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 25 === 0).select("doc_id", "text")
        .collect().foreach { r =>
          val id = r.getLong(0)
          val tail =
            (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
          val (w, h) = ((id % 640 + 1).toInt, (id * 7 % 480 + 1).toInt)
          val (name, header) =
            if (id % 50 == 0) (s"asset_$id.jpg", Multimodal.MediaHeaders.jpeg(w, h))
            else (s"asset_$id.png", Multimodal.MediaHeaders.png(w, h))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$base/$name"), header ++ tail)
        }
      base
    }

  // REAL image metadata decode end-to-end: binaryFile scan over planted
  // PNG/JPEG files → HeaderDecoder byte arithmetic → dimensions the
  // oracle re-derives from doc_id (the planting formula) — proving the
  // parser reads the actual header bytes, not a stub.
  private def mmDecodeImage(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.decodeMeta(
        Multimodal.ingestBinary(s, imageFixtureDir(s, d)))
      .toDF()
      .orderBy("asset_id")
  }

  /** Plant REAL audio/video container files once per (session, dir):
    * every 25th doc becomes `asset_<id>.wav` (a canonical 44-byte PCM
    * header: sample rate 8/16/24 kHz by id%3, mono/stereo by id%7, data
    * size = the text byte length riding as fake samples) — MP4 for
    * every 50th (`ftyp`+`moov`/`mvhd`, timescale 600, duration ticks
    * id·31 % 360000 + 600). All parameters derive from doc_id, so the
    * DuckDB oracle recomputes sample rate, channels, and the integer
    * duration math from the planting formula. */
  private def avFixtureDir(s: SparkSession, d: String): String =
    SessionMemo(s, d, "mm_av_fixtures") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_av_" +
        java.lang.Integer.toHexString(d.hashCode)
      val bp = java.nio.file.Paths.get(base)
      graft.sources.TableSwap.deleteRecursively(bp)
      java.nio.file.Files.createDirectories(bp)
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 25 === 0).select("doc_id", "text")
        .collect().foreach { r =>
          val id = r.getLong(0)
          val tail =
            (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
          val (name, header) =
            if (id % 50 == 0)
              (s"asset_$id.mp4", Multimodal.MediaHeaders.mp4(
                600, ((id * 31) % 360000 + 600).toInt))
            else
              (s"asset_$id.wav", Multimodal.MediaHeaders.wav(
                8000 * ((id % 3) + 1).toInt, if (id % 7 < 3) 1 else 2,
                tail.length))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$base/$name"), header ++ tail)
        }
      base
    }

  // REAL container metadata decode end-to-end: binaryFile scan over
  // planted WAV/MP4 files → RIFF chunk walk / ISO-BMFF box walk →
  // sample rate, channels, and integer duration the oracle re-derives
  // from the planting formula — proving the walkers read the actual
  // container bytes.
  private def mmDecodeAv(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAv(
        Multimodal.ingestBinary(s, avFixtureDir(s, d)))
      .toDF()
      .orderBy("asset_id")

  /** Plant a binary fixture directory once per (session, dir): every
    * 25th document's UTF-8 bytes as `asset_<id>.<ext>` (ext from id%3,
    * matching [[Multimodal.assetsFromText]]'s type rule), plus a
    * byte-identical copy under id+Offset for every 50th — then the
    * ingest tier reads them back through the REAL `binaryFile` source.
    * The driver-side file writes here are fixture PLANTING only
    * (bounded at 4% of docs); the operators under test are fully
    * distributed. */
  private def binaryFixtureDir(s: SparkSession, d: String): String =
    SessionMemo(s, d, "mm_binary_fixtures") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_mm_" +
        java.lang.Integer.toHexString(d.hashCode)
      val bp = java.nio.file.Paths.get(base)
      graft.sources.TableSwap.deleteRecursively(bp)
      java.nio.file.Files.createDirectories(bp)
      val docs = Tables.documents(s, d)
      Planting.requireHeadroom(docs, "doc_id", "mm_binary_ingest")
      val exts = Seq("mp4", "img", "wav")   // id%3 = video/image/audio
      docs.filter(col("doc_id") % 25 === 0).select("doc_id", "text")
        .collect().foreach { r =>
          val id = r.getLong(0)
          val bytes = r.getString(1).getBytes("UTF-8")
          val ext = exts((id % 3).toInt)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$base/asset_$id.$ext"), bytes)
          if (id % 50 == 0) java.nio.file.Files.write(
            java.nio.file.Paths.get(
              s"$base/asset_${id + Planting.Offset}.$ext"), bytes)
        }
      base
    }

  // The source side of the multimodal tier made real: opaque blobs in,
  // (id, type, payload) out, no decode at scan time.
  private def mmBinaryIngest(s: SparkSession, d: String): DataFrame =
    Multimodal.ingestBinary(s, binaryFixtureDir(s, d))
      .toDF()
      .select(col("asset_id"), col("media_type"),
        length(col("payload")).as("n_bytes"))
      .orderBy("asset_id")

  // Payload-identity media dedup over the ingested blobs: planted
  // copies (every 50th) collapse onto their originals; the oracle
  // groups by the SAME bytes via the text the fixtures were written
  // from, so the hash-and-verify grouping is proven collision-proof.
  private def mmDedupExact(s: SparkSession, d: String): DataFrame =
    Multimodal.dedupExactMedia(
        Multimodal.ingestBinary(s, binaryFixtureDir(s, d)))
      .orderBy("canonical_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta"       -> (mmDecodeMeta _),
    "mm_decode_image"      -> (mmDecodeImage _),
    "mm_decode_av"         -> (mmDecodeAv _),
    "mm_binary_ingest"     -> (mmBinaryIngest _),
    "mm_dedup_exact"       -> (mmDedupExact _),
  )

  val oracles: Map[String, String] = Map(

    // both entries recompute the fixture set from documents (the same
    // planting rule that wrote the files), so the whole binaryFile
    // read-back path — path parsing, type mapping, payload bytes — is
    // hash-checked, not just row-counted
    "mm_binary_ingest" ->
      """WITH f AS (
           SELECT doc_id AS asset_id, doc_id AS src_id, text
           FROM documents WHERE doc_id % 25 = 0
           UNION ALL
           SELECT doc_id + 100000 AS asset_id, doc_id AS src_id, text
           FROM documents WHERE doc_id % 50 = 0)
         SELECT asset_id,
                CASE WHEN src_id % 3 = 0 THEN 'video'
                     WHEN src_id % 3 = 1 THEN 'image'
                     ELSE 'audio' END AS media_type,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes
         FROM f ORDER BY asset_id""",

    "mm_dedup_exact" ->
      """WITH f AS (
           SELECT doc_id AS asset_id, text
           FROM documents WHERE doc_id % 25 = 0
           UNION ALL
           SELECT doc_id + 100000 AS asset_id, text
           FROM documents WHERE doc_id % 50 = 0),
         g AS (SELECT min(asset_id) AS canonical_id,
                      CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                      count(*) AS n_copies,
                      array_to_string(list(CAST(asset_id AS VARCHAR)
                        ORDER BY asset_id), ',') AS member_ids
               FROM f GROUP BY text)
         SELECT canonical_id, n_bytes, n_copies, member_ids
         FROM g ORDER BY canonical_id""",

    // mirrors the imageFixtureDir planting formula: header bytes carry
    // width = id%640+1, height = id*7%480+1; n_bytes = header length
    // (33 PNG / 39 JPEG, MediaHeaders.*HeaderLen) + the text tail
    "mm_decode_image" ->
      """SELECT doc_id AS asset_id, 'image' AS media_type,
                CAST(CASE WHEN doc_id % 50 = 0 THEN 39 ELSE 33 END
                     + octet_length(encode(coalesce(text, ''))) AS INT)
                  AS n_bytes,
                CAST(doc_id % 640 + 1 AS INT) AS width,
                CAST(doc_id * 7 % 480 + 1 AS INT) AS height,
                CAST(1 AS INT) AS n_frames,
                CAST(1 AS INT) AS n_sampled_frames
         FROM documents WHERE doc_id % 25 = 0
         ORDER BY asset_id""",

    // mirrors the avFixtureDir planting formula: WAV duration is the
    // data size over the derived byte rate (rate · channels · 2),
    // MP4 duration is ticks·1000 // 600 — both integer divisions, so
    // the comparison is exact
    "mm_decode_av" ->
      """SELECT doc_id AS asset_id,
                CASE WHEN doc_id % 50 = 0 THEN 'video'
                     ELSE 'audio' END AS media_type,
                CAST(CASE WHEN doc_id % 50 = 0 THEN 132 ELSE 44 END
                     + octet_length(encode(coalesce(text, ''))) AS INT)
                  AS n_bytes,
                CAST(CASE WHEN doc_id % 50 = 0 THEN 0
                     ELSE 8000 * (doc_id % 3 + 1) END AS INT)
                  AS sample_rate,
                CAST(CASE WHEN doc_id % 50 = 0 THEN 0
                     WHEN doc_id % 7 < 3 THEN 1 ELSE 2 END AS INT)
                  AS channels,
                CAST(CASE WHEN doc_id % 50 = 0
                     THEN (((doc_id * 31) % 360000 + 600) * 1000) // 600
                     ELSE (octet_length(encode(coalesce(text, ''))) * 1000)
                          // (8000 * (doc_id % 3 + 1)
                             * (CASE WHEN doc_id % 7 < 3 THEN 1 ELSE 2 END)
                             * 2) END AS BIGINT) AS duration_ms
         FROM documents WHERE doc_id % 25 = 0
         ORDER BY asset_id""",

    "mm_decode_meta" ->
      """SELECT doc_id AS asset_id,
                CASE WHEN doc_id % 3 = 0 THEN 'video'
                     WHEN doc_id % 3 = 1 THEN 'image'
                     ELSE 'audio' END AS media_type,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
                CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
                CAST(CASE WHEN doc_id % 3 = 0
                          THEN octet_length(encode(text)) % 30 + 1
                          ELSE 1 END AS INT) AS n_frames,
                CAST((CASE WHEN doc_id % 3 = 0
                           THEN octet_length(encode(text)) % 30 + 1
                           ELSE 1 END + 4) // 5 AS INT) AS n_sampled_frames
         FROM documents ORDER BY asset_id"""
  )
}
