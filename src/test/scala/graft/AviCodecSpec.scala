package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, Mp4Codec, Multimodal, PixelCodec}
import graft.multimodal.PixelCodec.Gray

/** The MJPEG-AVI tier: RIFF hdrl stream walk, movi chunk collection
  * (flat and `rec `-grouped layouts), per-frame JPEG decode, pixel
  * identity with the GIF/MP4 renderings of the same frames, and the
  * hostile-input discipline. */
class AviCodecSpec extends AnyFunSuite {

  private def frames(scene: Long, f: Int): Seq[Gray] =
    graft.queries.MultimodalFrameOps.frameGrids(scene, f)

  test("movi chunk walk round-trips: every frame decodes bit-exactly") {
    for (f <- Seq(1, 2, 3, 5, 6); rec <- Seq(0, 1, 2, 4)) {
      val fs = frames(42L + f, f)
      val avi = AviCodec.encodeMjpegAvi(fs, recGroup = rec)
      val d = AviCodec.decodeMjpegFrames(avi)
      assert(d.isDefined, s"f=$f rec=$rec")
      assert(d.get.length === f)
      for (i <- 0 until f)
        assert(d.get(i).luma.toSeq === fs(i).luma.toSeq,
          s"f=$f rec=$rec frame=$i")
    }
    // color frames (3-component JPEGs) land the same luma
    val fs = frames(7L, 4)
    val d = AviCodec.decodeMjpegFrames(
      AviCodec.encodeMjpegAvi(fs, color = true, recGroup = 2))
    assert(d.isDefined)
    for (i <- 0 until 4)
      assert(d.get(i).luma.toSeq === fs(i).luma.toSeq)
  }

  test("AVI, MP4, and GIF renderings of one clip hash frame-identical through the seam") {
    import graft.multimodal.GifCodec
    val fs = frames(99L, 4)
    val avi = Multimodal.decodeClipFrames(AviCodec.encodeMjpegAvi(fs)).get
    val mp4 = Multimodal.decodeClipFrames(Mp4Codec.encodeMjpegMp4(fs)).get
    val gif = Multimodal.decodeClipFrames(
      GifCodec.encodeGifAnimated(fs, salt = 3)).get
    assert(avi.length === gif.length && avi.length === mp4.length)
    for (i <- fs.indices) {
      val ha = PixelCodec.dhash64(PixelCodec.lumaGrid8(avi(i)).get)
      val hm = PixelCodec.dhash64(PixelCodec.lumaGrid8(mp4(i)).get)
      val hg = PixelCodec.dhash64(PixelCodec.lumaGrid8(gif(i)).get)
      assert(ha === hg, s"frame $i avi vs gif")
      assert(ha === hm, s"frame $i avi vs mp4")
    }
  }

  test("odd-length JPEG payloads keep the word-aligned chunk walk in step") {
    // scan sizes vary with content; across a few scenes at least one
    // sample lands odd, exercising the RIFF pad byte between chunks
    val anyOdd = (0 until 8).exists { s =>
      val fs = frames(1000L + s, 5)
      val avi = AviCodec.encodeMjpegAvi(fs)
      val d = AviCodec.decodeMjpegFrames(avi)
      assert(d.isDefined && d.get.length === 5, s"scene $s")
      for (i <- 0 until 5)
        assert(d.get(i).luma.toSeq === fs(i).luma.toSeq)
      fs.exists(g => graft.multimodal.JpegCodec
        .encodeJpeg(g).length % 2 == 1)
    }
    assert(anyOdd, "fixture scenes never produced an odd sample size")
  }

  test("hostile inputs never throw and decode to None") {
    val good = AviCodec.encodeMjpegAvi(frames(5L, 3))
    assert(AviCodec.decodeMjpegFrames(good).isDefined)
    // truncation: any cut inside hdrl or movi loses the stream table,
    // a chunk extent, or a sample tail → None; a cut that only drops
    // the trailing idx1 leaves a valid (index-less) AVI → Some
    // lastIndexOfSlice: the real idx1 header sits after any JPEG
    // entropy bytes that might collide with the ASCII pattern
    val idxAt = good.lastIndexOfSlice("idx1".getBytes("US-ASCII"))
    assert(idxAt > 0)
    for (n <- 0 until idxAt)
      assert(AviCodec.decodeMjpegFrames(good.take(n)).isEmpty, s"take($n)")
    assert(AviCodec.decodeMjpegFrames(good.take(idxAt)).isDefined)
    // a non-MJPEG vids stream (handler and biCompression clobbered)
    val mjpgAt = good.indexOfSlice("MJPG".getBytes("US-ASCII"))
    assert(mjpgAt > 0)
    val noMjpg = good.clone()
    var at = 0
    while ({ at = noMjpg.indexOfSlice("MJPG".getBytes("US-ASCII"), at)
             at >= 0 }) {
      noMjpg(at) = 'X'.toByte; at += 4
    }
    assert(AviCodec.decodeMjpegFrames(noMjpg).isEmpty)
    // a corrupted frame byte makes its JPEG undecodable → clip drops
    val dcAt = good.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(dcAt > 0)
    val mut = good.updated(dcAt + 8, (good(dcAt + 8) ^ 0x7f).toByte)
    assert(AviCodec.decodeMjpegFrames(mut).isEmpty)
    assert(AviCodec.decodeMjpegFrames(Array.empty).isEmpty)
    assert(AviCodec.decodeMjpegFrames("not an avi".getBytes).isEmpty)
    // WAV is RIFF too — must fall through cleanly, not half-parse
    assert(AviCodec.decodeMjpegFrames(
      Multimodal.MediaHeaders.wav(8000, 1, 64)).isEmpty)
    // seeded-random fuzz behind a plausible RIFF/AVI header
    val rnd = new scala.util.Random(778)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(300) + 16)
      rnd.nextBytes(junk)
      "RIFF".getBytes.copyToArray(junk, 0)
      "AVI ".getBytes.copyToArray(junk, 8)
      AviCodec.decodeMjpegFrames(junk) // no throw is the assertion
    }
  }
}
