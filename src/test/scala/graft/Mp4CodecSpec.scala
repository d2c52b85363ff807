package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Mp4Codec, Multimodal, PixelCodec}
import graft.multimodal.PixelCodec.Gray

/** The MJPEG-in-MP4 tier: box-tree walk to the video track, sample-
  * table reconstruction (stsz/stco/stsc incl. multi-chunk runs),
  * per-sample JPEG decode, pixel identity with the GIF rendering of
  * the same frames, and the hostile-input discipline. */
class Mp4CodecSpec extends AnyFunSuite {

  private def frames(scene: Long, f: Int): Seq[Gray] =
    graft.queries.MultimodalFrameOps.frameGrids(scene, f)

  test("sample tables round-trip: every frame decodes bit-exactly") {
    for (f <- Seq(1, 2, 3, 5, 6); chunk <- Seq(1, 2, 4)) {
      val fs = frames(42L + f, f)
      val mp4 = Mp4Codec.encodeMjpegMp4(fs, chunkSize = chunk)
      val d = Mp4Codec.decodeMjpegFrames(mp4)
      assert(d.isDefined, s"f=$f chunk=$chunk")
      assert(d.get.length === f)
      for (i <- 0 until f)
        assert(d.get(i).luma.toSeq === fs(i).luma.toSeq,
          s"f=$f chunk=$chunk frame=$i")
    }
    // color samples (3-component JPEGs) land the same luma
    val fs = frames(7L, 4)
    val d = Mp4Codec.decodeMjpegFrames(
      Mp4Codec.encodeMjpegMp4(fs, color = true))
    assert(d.isDefined)
    for (i <- 0 until 4)
      assert(d.get(i).luma.toSeq === fs(i).luma.toSeq)
  }

  test("MP4 and GIF renderings of one clip hash frame-identical through the seam") {
    import graft.multimodal.GifCodec
    val fs = frames(99L, 4)
    val mp4 = Multimodal.decodeClipFrames(Mp4Codec.encodeMjpegMp4(fs)).get
    val gif = Multimodal.decodeClipFrames(
      GifCodec.encodeGifAnimated(fs, salt = 3)).get
    assert(mp4.length === gif.length)
    for (i <- fs.indices) {
      val hm = PixelCodec.dhash64(PixelCodec.lumaGrid8(mp4(i)).get)
      val hg = PixelCodec.dhash64(PixelCodec.lumaGrid8(gif(i)).get)
      assert(hm === hg, s"frame $i")
    }
  }

  test("hostile inputs never throw and decode to None") {
    val good = Mp4Codec.encodeMjpegMp4(frames(5L, 3))
    assert(Mp4Codec.decodeMjpegFrames(good).isDefined)
    // truncation at every byte: mdat precedes moov, so any cut loses
    // the sample tables or a sample extent
    for (n <- 0 until good.length by 1)
      assert(Mp4Codec.decodeMjpegFrames(good.take(n)).isEmpty, s"take($n)")
    // the header-only mvhd fixture (AvHeaderDecoder's shape): no trak
    assert(Mp4Codec.decodeMjpegFrames(
      Multimodal.MediaHeaders.mp4(600, 1200)).isEmpty)
    // a corrupted sample byte makes its JPEG undecodable → clip drops
    val mdatAt = good.indexOfSlice("mdat".getBytes("US-ASCII"))
    assert(mdatAt > 0)
    val mut = good.updated(mdatAt + 8,
      (good(mdatAt + 8) ^ 0x7f).toByte) // SOI of the first sample
    assert(Mp4Codec.decodeMjpegFrames(mut).isEmpty)
    assert(Mp4Codec.decodeMjpegFrames(Array.empty).isEmpty)
    assert(Mp4Codec.decodeMjpegFrames("not an mp4".getBytes).isEmpty)
    // seeded-random fuzz behind a plausible box header: never throws
    val rnd = new scala.util.Random(777)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(300) + 16)
      rnd.nextBytes(junk)
      junk(4) = 'm'; junk(5) = 'o'; junk(6) = 'o'; junk(7) = 'v'
      Mp4Codec.decodeMjpegFrames(junk) // no throw is the assertion
    }
  }
}
