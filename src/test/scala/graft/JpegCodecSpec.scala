package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{JpegCodec, PixelCodec}
import graft.multimodal.PixelCodec.Gray

/** The baseline-JPEG tier: REAL entropy + DCT decode (marker walk,
  * canonical Huffman, byte unstuffing, restart markers, separable
  * IDCT), the DC-only exactness property the planted fixtures lean on,
  * near-losslessness of the unit quant table on general content, and
  * the hostile-input discipline. */
class JpegCodecSpec extends AnyFunSuite {

  private def noisy(w: Int, h: Int, seed: Int): Gray =
    Gray(w, h, Array.tabulate(w * h)(i =>
      (i * 2654435761L + seed * 40503L).toInt & 0xff))

  test("block-constant content round-trips bit-exactly (DC-only blocks, unit quant)") {
    // every possible constant value, one 8x8 block
    for (v <- 0 until 256) {
      val img = Gray(8, 8, Array.fill(64)(v))
      val d = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img))
      assert(d.isDefined, s"v=$v")
      assert(d.get.luma.toSeq === img.luma.toSeq, s"v=$v")
    }
    // a full scene rendering (the fixture shape): 64x64, 8x8 tiles
    val scene = PixelCodec.renderGrid(PixelCodec.sceneGrid(4242L), 64)
    assert(JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(scene)).get
      .luma.toSeq === scene.luma.toSeq)
  }

  test("color + subsampling + restart markers: Y plane still exact on block-constant scenes") {
    val scene = PixelCodec.renderGrid(PixelCodec.sceneGrid(777L), 64)
    for ((sh, sv) <- Seq((1, 1), (2, 1), (2, 2)); ri <- Seq(0, 3)) {
      val b = JpegCodec.encodeJpeg(scene, color = true, ySampH = sh,
        ySampV = sv, restartInterval = ri)
      val d = JpegCodec.decodeJpeg(b)
      assert(d.isDefined, s"samp ${sh}x$sv ri=$ri")
      assert(d.get.width === 64 && d.get.height === 64)
      assert(d.get.luma.toSeq === scene.luma.toSeq, s"samp ${sh}x$sv ri=$ri")
    }
    // byte-distinct from the PNG rendering of the same scene, yet the
    // perceptual hash is identical — the planted-variant property
    val png = PixelCodec.encodeGray8Png(scene)
    val jpg = JpegCodec.encodeJpeg(scene, color = true, ySampH = 2,
      ySampV = 2, restartInterval = 3)
    assert(!jpg.sameElements(png))
    assert(PixelCodec.phash(jpg).get === PixelCodec.phash(png).get)
  }

  test("general content: near-lossless under the unit table; odd dims pad and crop") {
    for ((w, h) <- Seq((8, 8), (16, 24), (17, 9), (64, 64))) {
      val img = noisy(w, h, w + h)
      val d = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img))
      assert(d.isDefined, s"${w}x$h")
      assert(d.get.width === w && d.get.height === h)
      val maxErr = d.get.luma.zip(img.luma).map {
        case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 3, s"${w}x$h maxErr=$maxErr")
    }
  }

  test("hostile inputs never throw and decode to None") {
    val good = JpegCodec.encodeJpeg(noisy(16, 16, 5))
    val hostile = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](0xff.toByte, 0xd8.toByte),   // bare SOI
      good.take(20),                           // truncated in tables
      good.take(good.length / 2),              // truncated mid-scan
      good.updated(4, 0x7f.toByte),            // DQT length past buffer
      // SOF marker changed to progressive (0xc2): the progressive
      // decoder takes over but must reject the sequential full-band
      // scan header (Ss=0, Se=63 is illegal under SOF2)
      {
        val i = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
        good.updated(i + 1, 0xc2.toByte)
      },
      Array.fill[Byte](64)(0xff.toByte),
      "not a jpeg at all".getBytes("US-ASCII"))
    hostile.foreach(b => assert(JpegCodec.decodeJpeg(b).isEmpty))
    // the header-only metadata fixture (SOF bytes, no scan) is not
    // pixel-decodable — the HeaderDecoder tier owns it
    val headerOnly = graft.multimodal.Multimodal.MediaHeaders.jpeg(64, 48) ++
      "payload tail".getBytes("US-ASCII")
    assert(JpegCodec.decodeJpeg(headerOnly).isEmpty)
    // a restart-interval stream whose first RST marker is clobbered:
    // the decoder expects FFD0 at the boundary and must reject
    val noisyImg = noisy(32, 8, 4)
    val withRst = JpegCodec.encodeJpeg(noisyImg,
      color = true, restartInterval = 1)
    // the valid stream must decode first (positive coverage of the
    // pad-bits-before-RST path — incl. the stuffed 0xFF pad byte case
    // — on general, non-block-constant content)
    val rstOk = JpegCodec.decodeJpeg(withRst)
    assert(rstOk.isDefined)
    assert(rstOk.get.luma.zip(noisyImg.luma)
      .map { case (a, b) => math.abs(a - b) }.max <= 3)
    val rstAt = withRst.indexOfSlice(Seq(0xff.toByte, 0xd0.toByte))
    assert(rstAt > 0)
    // T.81 B.1.1.2 fill bytes: a conforming third-party stream may pad
    // 0xFF bytes before any marker — inject one before the RST and the
    // decode must land the same pixels
    val filled = withRst.patch(rstAt, Seq(0xff.toByte), 0)
    assert(JpegCodec.decodeJpeg(filled).map(_.luma.toSeq)
      === rstOk.map(_.luma.toSeq))
    assert(JpegCodec.decodeJpeg(
      withRst.updated(rstAt + 1, 0x3f.toByte)).isEmpty)
    // truncation at EVERY byte boundary up to the end of scan data
    // (a file cut only inside the trailing EOI still holds a complete
    // scan — tolerated, like every production decoder)
    val tiny = JpegCodec.encodeJpeg(Gray(8, 8, Array.fill(64)(42)))
    for (n <- 0 until tiny.length - 2)
      assert(JpegCodec.decodeJpeg(tiny.take(n)).isEmpty, s"take($n)")
  }
}
