package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{PixelCodec, WebpCodec, WebpEncoder}
import graft.multimodal.PixelCodec.Gray

/** The WebP lossless (VP8L) tier: RIFF walk, LSB-first bit order,
  * canonical prefix codes (simple and code-length-coded with 16/17/18
  * runs), color cache, LZ77 with the 120-entry 2D distance map, all
  * four transforms (predictor ×14 modes, cross-color, subtract-green,
  * color indexing with sub-byte bundling), losslessness of every
  * dial combination, cross-format pixel identity vs PNG, and the
  * hostile-input discipline (truncation anywhere → None, no throw). */
class WebpCodecSpec extends AnyFunSuite {

  private def noisy(w: Int, h: Int, seed: Int): Gray =
    Gray(w, h, Array.tabulate(w * h)(i =>
      (i * 2654435761L + seed * 40503L).toInt & 0xff))

  private def rt(img: Gray, enc: Array[Byte]): Unit = {
    val d = WebpCodec.decodeWebp(enc)
    assert(d.isDefined, s"${img.width}x${img.height}")
    assert(d.get.width === img.width && d.get.height === img.height)
    assert(d.get.luma.toSeq === img.luma.toSeq,
      s"${img.width}x${img.height}")
  }

  test("plain gray round trip is bit-exact across shapes") {
    for ((w, h) <- Seq((1, 1), (8, 8), (64, 64), (13, 7), (1, 40),
        (40, 1), (97, 53))) {
      val img = noisy(w, h, w * 31 + h)
      rt(img, WebpEncoder.encodeWebp(img, subtractGreen = false,
        lz77 = false))
    }
  }

  test("every transform dial round-trips bit-exact (gray and color)") {
    val img = noisy(64, 48, 5)
    for (color <- Seq(false, true); salt <- Seq(0, 3, 11)) {
      rt(img, WebpEncoder.encodeWebp(img, salt, color = color))
      rt(img, WebpEncoder.encodeWebp(img, salt, color = color,
        predictorBits = 4))
      rt(img, WebpEncoder.encodeWebp(img, salt, color = color,
        crossColor = true))
      rt(img, WebpEncoder.encodeWebp(img, salt, color = color,
        predictorBits = 2, crossColor = true, cacheBits = 6))
    }
  }

  test("all 14 predictor modes survive odd tile geometry") {
    // bits=2 → 4-px tiles: a 37x23 image has 10x6 tiles, cycling
    // (salt+t)%14 covers every mode incl. the border laws
    for (salt <- 0 until 14) {
      val img = noisy(37, 23, salt)
      rt(img, WebpEncoder.encodeWebp(img, salt, predictorBits = 2,
        subtractGreen = false))
    }
  }

  test("palette round trips, with sub-byte bundling at 2/4/16 colors") {
    for ((nColors, w, h) <- Seq((2, 29, 13), (3, 16, 16), (4, 33, 9),
        (7, 20, 11), (16, 31, 17), (60, 64, 64), (256, 64, 48))) {
      val img = Gray(w, h, Array.tabulate(w * h)(i =>
        ((i * 2654435761L >>> 8) % nColors).toInt * (255 / nColors)))
      rt(img, WebpEncoder.encodeWebp(img, palette = true,
        subtractGreen = false, lz77 = false))
      rt(img, WebpEncoder.encodeWebp(img, palette = true,
        subtractGreen = false))        // bundled stream + LZ77
    }
  }

  test("LZ77 runs and the 2D distance map reproduce exactly") {
    // horizontal runs (dist 1) and a copied row (dist w → map code 1)
    val w = 40; val h = 20
    val luma = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w)
      luma(y * w + x) =
        if (y % 3 == 2) luma((y - 1) * w + x)      // vertical copy
        else if (x < 20) 77                         // horizontal run
        else (x * 13 + y * 7) % 256
    val img = Gray(w, h, luma)
    rt(img, WebpEncoder.encodeWebp(img))
    rt(img, WebpEncoder.encodeWebp(img, cacheBits = 4))
    // constant image: one literal + one max-run chain
    val const = Gray(100, 80, Array.fill(8000)(123))
    rt(const, WebpEncoder.encodeWebp(const))
  }

  test("color cache round trips at every legal size") {
    val img = noisy(48, 32, 9)
    for (cb <- Seq(1, 4, 8, 11))
      rt(img, WebpEncoder.encodeWebp(img, cacheBits = cb, lz77 = false))
  }

  test("scene renderings hash identically across WebP/PNG (the variant property)") {
    for (id <- Seq(25L, 150L, 1575L)) {
      val grid = PixelCodec.sceneGrid(id)
      val png = PixelCodec.decodePng(
        PixelCodec.encodeGray8Png(PixelCodec.renderGrid(grid, 64))).get
      val webp = WebpCodec.decodeWebp(WebpEncoder.encodeWebp(
        PixelCodec.renderGrid(grid, 64), salt = (id % 9).toInt,
        color = true, crossColor = true, cacheBits = 8)).get
      assert(webp.luma.toSeq === png.luma.toSeq)
      assert(PixelCodec.dhash64(PixelCodec.lumaGrid8(webp).get) ===
        PixelCodec.dhash64(PixelCodec.lumaGrid8(png).get))
    }
  }

  test("decodePixels dispatches WebP") {
    val img = noisy(32, 32, 4)
    val d = PixelCodec.decodePixels(WebpEncoder.encodeWebp(img))
    assert(d.isDefined && d.get.luma.toSeq === img.luma.toSeq)
  }

  test("animated clips composite sub-rects back to the exact frames") {
    val frames = graft.queries.MultimodalFrameOps.frameGrids(75L, 5)
    for ((color, salt) <- Seq((false, 0), (true, 4))) {
      val delta = WebpEncoder.encodeWebpAnimated(frames, salt,
        deltaRect = true, color = color)
      val full = WebpEncoder.encodeWebpAnimated(frames, salt,
        deltaRect = false, color = color)
      assert(!delta.sameElements(full))    // byte-distinct encodings
      for (enc <- Seq(delta, full)) {
        val dec = WebpCodec.decodeWebpFrames(enc)
        assert(dec.isDefined && dec.get.length === frames.length)
        dec.get.zip(frames).foreach { case (d, e) =>
          assert(d.width === 64 && d.height === 64)
          assert(d.luma.toSeq === e.luma.toSeq)
        }
      }
    }
    // dispose-to-background (full-canvas frames) lands the same frames
    val disp = WebpCodec.decodeWebpFrames(
      WebpEncoder.encodeWebpAnimated(frames, disposeBg = true,
        bg = (200, 100, 50)))
    assert(disp.isDefined)
    disp.get.zip(frames).foreach { case (d, e) =>
      assert(d.luma.toSeq === e.luma.toSeq)
    }
    // the clip seam dispatches WebP
    val viaSeam = graft.multimodal.Multimodal.decodeClipFrames(
      WebpEncoder.encodeWebpAnimated(frames))
    assert(viaSeam.isDefined && viaSeam.get.length === frames.length)
    // cross-container identity: the GIF rendering of the same frames
    // decodes to identical pixels (the mm_frame_near planting law)
    val gif = graft.multimodal.GifCodec.decodeGifFrames(
      graft.multimodal.GifCodec.encodeGifAnimated(frames, salt = 2))
    gif.get.zip(WebpCodec.decodeWebpFrames(
      WebpEncoder.encodeWebpAnimated(frames)).get).foreach {
      case (a, b) => assert(a.luma.toSeq === b.luma.toSeq)
    }
  }

  test("animated: single-frame and simple-VP8L forms decode as 1-frame clips") {
    val img = noisy(40, 24, 8)
    val one = WebpCodec.decodeWebpFrames(
      WebpEncoder.encodeWebpAnimated(Seq(img)))
    assert(one.isDefined && one.get.length === 1)
    assert(one.get.head.luma.toSeq === img.luma.toSeq)
    val simple = WebpCodec.decodeWebpFrames(WebpEncoder.encodeWebp(img))
    assert(simple.isDefined && simple.get.length === 1)
    assert(simple.get.head.luma.toSeq === img.luma.toSeq)
  }

  test("animated hostile inputs return None and never throw") {
    val frames = graft.queries.MultimodalFrameOps.frameGrids(100L, 4)
    val enc = WebpEncoder.encodeWebpAnimated(frames)
    // truncation at EVERY byte boundary — a clip cut at a chunk
    // boundary must NOT surface as a shorter valid clip
    for (n <- 0 until enc.length)
      assert(WebpCodec.decodeWebpFrames(enc.take(n)).isEmpty,
        s"truncated@$n")
    // a lossy frame tag drops the whole clip
    val lossy = enc.clone()
    val at = lossy.indexOfSlice("VP8L".getBytes("US-ASCII").toSeq,
      30) // first in-ANMF occurrence
    System.arraycopy("VP8 ".getBytes, 0, lossy, at, 4)
    assert(WebpCodec.decodeWebpFrames(lossy).isEmpty)
    // garbage body never throws
    WebpCodec.decodeWebpFrames(enc.take(40) ++
      Array.fill[Byte](64)(0x3c))
  }

  test("an ALPH chunk before the image chunk drops the still at the " +
      "gate (the decodeWebpFrames alpha discipline)") {
    val img = noisy(16, 12, 4)
    val enc = WebpEncoder.encodeWebp(img)
    assert(WebpCodec.decodeWebp(enc).isDefined)
    // splice an ALPH chunk (size 1 + pad) ahead of the image chunk:
    // decoding the opaque frame would ignore the alpha plane and land
    // wrong pixels — the still path must return None like the clip path
    val alph = "ALPH".getBytes ++
      Array[Byte](1, 0, 0, 0) ++ Array[Byte](0, 0)
    val spliced = enc.take(12) ++ alph ++ enc.drop(12)
    val riffSz = (enc.length - 8) + alph.length
    spliced(4) = (riffSz & 0xff).toByte
    spliced(5) = ((riffSz >> 8) & 0xff).toByte
    spliced(6) = ((riffSz >> 16) & 0xff).toByte
    spliced(7) = ((riffSz >> 24) & 0xff).toByte
    assert(WebpCodec.decodeWebp(spliced).isEmpty)
  }

  test("hostile inputs return None and never throw") {
    val img = noisy(24, 18, 2)
    val enc = WebpEncoder.encodeWebp(img, predictorBits = 3,
      cacheBits = 5)
    // truncation at EVERY byte boundary: any missing payload byte
    // fails the chunk-size check → None; dropping ONLY the RIFF pad
    // byte leaves a complete stream, which must then decode exactly
    for (n <- 0 until enc.length) {
      val d = WebpCodec.decodeWebp(enc.take(n))
      if (n < enc.length - 1) assert(d.isEmpty, s"truncated@$n")
      else assert(d.isEmpty || d.get.luma.toSeq == img.luma.toSeq)
    }
    // flipped signature / lossy tag / bad version
    val lossy = enc.clone(); System.arraycopy("VP8 ".getBytes, 0, lossy, 12, 4)
    assert(WebpCodec.decodeWebp(lossy).isEmpty)
    val badSig = enc.clone(); badSig(20) = 0x2e
    assert(WebpCodec.decodeWebp(badSig).isEmpty)
    assert(WebpCodec.decodeWebp(Array.emptyByteArray).isEmpty)
    assert(WebpCodec.decodeWebp("RIFFxxxxWEBP".getBytes).isEmpty)
    // declared chunk size past the buffer
    val overrun = enc.clone(); overrun(16) = 0x7f.toByte
    assert(WebpCodec.decodeWebp(overrun).isEmpty)
    // garbage body after a valid header: must not throw
    val garbage = enc.take(21) ++ Array.fill[Byte](40)(0x55)
    WebpCodec.decodeWebp(garbage) // Option either way; just no throw
  }

}
