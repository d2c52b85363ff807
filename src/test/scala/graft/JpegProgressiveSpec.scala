package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{JpegCodec, JpegProgressive, PixelCodec}
import graft.multimodal.PixelCodec.Gray

/** The progressive-JPEG tier: SOF2 marker walk, successive-
  * approximation DC first/refine scans, spectral-selection AC
  * first/refine scans with EOB runs and correction bits, the
  * block-constant exactness property the planted fixture family leans
  * on, agreement with the sequential decoder on general content, and
  * the hostile-input discipline across every scan path. */
class JpegProgressiveSpec extends AnyFunSuite {

  private def noisy(w: Int, h: Int, seed: Int): Gray =
    Gray(w, h, Array.tabulate(w * h)(i =>
      (i * 2654435761L + seed * 40503L).toInt & 0xff))

  test("block-constant content round-trips bit-exactly through all scan passes") {
    for (v <- Seq(0, 1, 127, 128, 254, 255)) {
      val img = Gray(8, 8, Array.fill(64)(v))
      val d = JpegCodec.decodeJpeg(JpegProgressive.encodeProgressive(img))
      assert(d.isDefined, s"v=$v")
      assert(d.get.luma.toSeq === img.luma.toSeq, s"v=$v")
    }
    // full scene renderings (the fixture shape), grayscale AND color
    val scene = PixelCodec.renderGrid(PixelCodec.sceneGrid(4242L), 64)
    for (color <- Seq(false, true)) {
      val b = JpegProgressive.encodeProgressive(scene, color = color)
      val d = JpegCodec.decodeJpeg(b)
      assert(d.isDefined, s"color=$color")
      assert(d.get.luma.toSeq === scene.luma.toSeq, s"color=$color")
    }
  }

  test("progressive and sequential renderings of one scene hash identically") {
    val scene = PixelCodec.renderGrid(PixelCodec.sceneGrid(777L), 64)
    val prog = JpegProgressive.encodeProgressive(scene, color = true)
    val seq = JpegCodec.encodeJpeg(scene, color = true,
      ySampH = 2, ySampV = 2, restartInterval = 3)
    val png = PixelCodec.encodeGray8Png(scene)
    assert(!prog.sameElements(seq))
    assert(PixelCodec.phash(prog).get === PixelCodec.phash(png).get)
    assert(PixelCodec.phash(prog).get === PixelCodec.phash(seq).get)
  }

  test("general content: near-lossless under the unit table; odd dims; band splits") {
    for ((w, h) <- Seq((8, 8), (16, 24), (17, 9), (64, 64));
         split <- Seq(1, 5, 20, 62)) {
      val img = noisy(w, h, w + h + split)
      val d = JpegCodec.decodeJpeg(
        JpegProgressive.encodeProgressive(img, bandSplit = split))
      assert(d.isDefined, s"${w}x$h split=$split")
      assert(d.get.width === w && d.get.height === h)
      val maxErr = d.get.luma.zip(img.luma).map {
        case (a, b) => math.abs(a - b) }.max
      // two point-transform levels lose at most the bit the refine
      // scan restores; the unit table keeps the rest within IDCT
      // rounding — same bound as the sequential spec
      assert(maxErr <= 3, s"${w}x$h split=$split maxErr=$maxErr")
    }
    // color (interleaved DC + skipped chroma scans) on general content
    val img = noisy(24, 16, 99)
    val d = JpegCodec.decodeJpeg(
      JpegProgressive.encodeProgressive(img, color = true))
    assert(d.isDefined)
    assert(d.get.luma.zip(img.luma)
      .map { case (a, b) => math.abs(a - b) }.max <= 3)
  }

  test("EOB-run batching: sparse content exercises multi-block EOBn codes") {
    // mostly-flat image with isolated bright pixels: most blocks are
    // DC-only, so AC scans carry long cross-block EOB runs
    val px = Array.fill(64 * 64)(100)
    for (i <- Seq(5, 700, 2100, 4000)) px(i) = 250
    val img = Gray(64, 64, px)
    val d = JpegCodec.decodeJpeg(JpegProgressive.encodeProgressive(img))
    assert(d.isDefined)
    assert(d.get.luma.zip(img.luma)
      .map { case (a, b) => math.abs(a - b) }.max <= 3)
  }

  test("hostile inputs never throw and decode to None") {
    val good = JpegProgressive.encodeProgressive(noisy(16, 16, 5))
    val colorGood = JpegProgressive.encodeProgressive(noisy(16, 16, 6),
      color = true)
    val hostile = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](0xff.toByte, 0xd8.toByte),
      good.take(20),                 // truncated in tables
      good.take(good.length / 2),    // truncated mid-scan
      good.updated(4, 0x7f.toByte),  // DQT length past buffer
      good.dropRight(2),             // EOI missing: incomplete stream
      Array.fill[Byte](64)(0xff.toByte))
    hostile.foreach(b => assert(JpegCodec.decodeJpeg(b).isEmpty))
    // truncation at EVERY byte boundary: a progressive stream is only
    // complete at EOI, so every proper prefix must reject
    val tiny = JpegProgressive.encodeProgressive(
      Gray(8, 8, Array.fill(64)(42)), color = true)
    for (n <- 0 until tiny.length)
      assert(JpegCodec.decodeJpeg(tiny.take(n)).isEmpty, s"take($n)")
    // a corrupted SOS band (Ss=0, Se=63 is sequential-only) rejects
    val sosAt = good.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
    assert(sosAt > 0)
    // scan header: FF DA len2 ns comps... Ss Se AhAl — Ss sits 5 bytes
    // from the marker for ns=1
    val ssOff = sosAt + 2 + 2 + 1 + 2
    assert((good(ssOff + 1) & 0xff) <= 63)
    assert(JpegCodec.decodeJpeg(
      good.updated(ssOff + 1, 0x7f.toByte)).isEmpty) // Se > 63
    // seeded-random fuzz: arbitrary bytes behind a valid SOI never throw
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(400) + 4)
      rnd.nextBytes(junk)
      junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte
      junk(2) = 0xff.toByte; junk(3) = 0xc2.toByte
      assert(JpegProgressive.decode(junk).isEmpty ||
        JpegProgressive.decode(junk).isDefined) // no throw is the assert
    }
    // corrupted tails of a valid color stream
    for (off <- colorGood.length / 2 until colorGood.length by 7) {
      val mut = colorGood.updated(off, (colorGood(off) ^ 0x55).toByte)
      JpegCodec.decodeJpeg(mut) // must not throw; result is Some or None
    }
  }
}
