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

  test("AVC digest tier: re-muxed twins fingerprint identically, " +
      "framing changes never leak into the digest") {
    val a = Mp4Codec.encodeAvcMp4(75L, 4, 64, 64, chunkSize = 2,
      lengthSize = 4)
    val b = Mp4Codec.encodeAvcMp4(75L, 4, 64, 64, chunkSize = 3,
      lengthSize = 2)
    val c = Mp4Codec.encodeAvcMp4(75L, 4, 64, 64, chunkSize = 1,
      lengthSize = 1)
    assert(!a.sameElements(b) && !b.sameElements(c)) // byte-distinct
    val da = Mp4Codec.decodeAvcDigest(a).get
    val db = Mp4Codec.decodeAvcDigest(b).get
    val dc = Mp4Codec.decodeAvcDigest(c).get
    assert(da.width === 64 && da.height === 64)
    assert(da.profile === 66 && da.level === 30)
    assert(da.sampleDigests.length === 4)
    assert(da.sampleDigests === db.sampleDigests)
    assert(da.fingerprint === db.fingerprint)
    assert(da.fingerprint === dc.fingerprint)
    // different content → different fingerprint
    val other = Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcMp4(76L, 4, 64, 64)).get
    assert(other.fingerprint !== da.fingerprint)
    val shorter = Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcMp4(75L, 3, 64, 64)).get
    assert(shorter.fingerprint !== da.fingerprint)
    // the digest matches the oracle formula: md5 over NAL payloads
    // (frame 0: sei + idr; later frames: idr alone)
    val k1Payload = "avc:75:1:" +
      Mp4Codec.md5Hex("n75_1".getBytes("UTF-8"))
    assert(da.sampleDigests(1) ===
      Mp4Codec.md5Hex(k1Payload.getBytes("US-ASCII")))
    val k0Payload = "sei:75" + "avc:75:0:" +
      Mp4Codec.md5Hex("n75_0".getBytes("UTF-8"))
    assert(da.sampleDigests(0) ===
      Mp4Codec.md5Hex(k0Payload.getBytes("US-ASCII")))
  }

  test("AVC digest tier: the contract boundary holds both ways") {
    val avc = Mp4Codec.encodeAvcMp4(100L, 3, 64, 64)
    // no pixel decode is attempted on AVC tracks
    assert(Mp4Codec.decodeMjpegFrames(avc).isEmpty)
    assert(Multimodal.decodeClipFrames(avc).isEmpty)
    // and the digest tier rejects MJPEG tracks (they have the pixel
    // path) and malformed AVC structure
    val mjpeg = Mp4Codec.encodeMjpegMp4(frames(5L, 3))
    assert(Mp4Codec.decodeAvcDigest(mjpeg).isEmpty)
    // truncation at every byte → None, never a partial digest
    for (n <- 0 until avc.length by 1)
      assert(Mp4Codec.decodeAvcDigest(avc.take(n)).isEmpty, s"take($n)")
    // corrupt the first NAL header (right after the 4-byte length
    // prefix at payload start): forbidden bit + invalid type
    val mdatAt = avc.indexOfSlice("mdat".getBytes("US-ASCII"))
    val mut = avc.updated(mdatAt + 8, 0x80.toByte)
    assert(Mp4Codec.decodeAvcDigest(mut).isEmpty)
    // corrupt the avcC version byte
    val avcCAt = avc.indexOfSlice("avcC".getBytes("US-ASCII"))
    val mut2 = avc.updated(avcCAt + 4, 9.toByte)
    assert(Mp4Codec.decodeAvcDigest(mut2).isEmpty)
    // seeded fuzz: never throws
    val rnd = new scala.util.Random(778)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(300) + 16)
      rnd.nextBytes(junk)
      junk(4) = 'm'; junk(5) = 'o'; junk(6) = 'o'; junk(7) = 'v'
      Mp4Codec.decodeAvcDigest(junk)
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
