package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** The real source side of the multimodal tier: binaryFile ingestion
  * (path-parsed ids/types, byte-faithful payloads, nonconforming files
  * dropped) and payload-identity media dedup. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def plant(files: (String, String)*): String = {
    val dir = Files.createTempDirectory("mm_fixture").toString
    files.foreach { case (name, content) =>
      Files.write(Paths.get(s"$dir/$name"), content.getBytes("UTF-8"))
    }
    dir
  }

  test("ingestBinary: ids and types from the path, bytes untouched") {
    val dir = plant(
      "asset_1.img" -> "image-bytes",
      "asset_3.mp4" -> "video-bytes",
      "asset_5.wav" -> "audio-bytes",
      "README.txt" -> "not an asset",       // nonconforming name
      "asset_7.xyz" -> "unknown extension") // unmapped type
    val out = Multimodal.ingestBinary(spark, dir).collect()
      .map(a => a.asset_id -> (a.media_type, new String(a.payload, "UTF-8")))
      .toMap
    assert(out === Map(
      1L -> ("image", "image-bytes"),
      3L -> ("video", "video-bytes"),
      5L -> ("audio", "audio-bytes")))
  }

  test("dedupExactMedia: identical payloads group across media types") {
    val dir = plant(
      "asset_2.img" -> "same-bytes",
      "asset_4.wav" -> "same-bytes",   // cross-type exact copy
      "asset_6.img" -> "other-bytes")
    val out = Multimodal.dedupExactMedia(
        Multimodal.ingestBinary(spark, dir))
      .orderBy("canonical_id").collect()
      .map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_copies"),
        r.getAs[String]("member_ids")))
    assert(out.toSeq === Seq((2L, 2L, "2,4"), (6L, 1L, "6")))
  }
}
