package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{GifCodec, PixelCodec}
import graft.multimodal.PixelCodec.Gray

/** The GIF tier: REAL LZW decode (variable code width, dictionary
  * growth to 4096 with clear-code reset, KwKwK case, sub-block
  * reassembly), palette→luma exactness, losslessness of the round
  * trip on any ≤256-distinct-luma image, and hostile inputs. */
class GifCodecSpec extends AnyFunSuite {

  private def noisy(w: Int, h: Int, seed: Int): Gray =
    Gray(w, h, Array.tabulate(w * h)(i =>
      (i * 2654435761L + seed * 40503L).toInt & 0xff))

  test("round trip is bit-exact on arbitrary content (GIF is lossless)") {
    // noisy images exercise real dictionary growth + width escalation;
    // the 200x150 case (30k near-random pixels, short LZW strings)
    // drives the dictionary past 4096 and through the clear-code reset
    for ((w, h) <- Seq((8, 8), (16, 24), (64, 64), (13, 7), (200, 150))) {
      val img = noisy(w, h, w * 31 + h)
      val d = GifCodec.decodeGif(GifCodec.encodeGif(img))
      assert(d.isDefined, s"${w}x$h")
      assert(d.get.width === w && d.get.height === h)
      assert(d.get.luma.toSeq === img.luma.toSeq, s"${w}x$h")
    }
    // a long repetitive image drives the dictionary to the 4096 cap
    // and through the clear-code reset path
    val big = Gray(256, 64, Array.tabulate(256 * 64)(i => (i / 97) % 7))
    assert(GifCodec.decodeGif(GifCodec.encodeGif(big)).get
      .luma.toSeq === big.luma.toSeq)
    // two-color image: the minimum 2-bit code path
    val bw = Gray(16, 16, Array.tabulate(256)(i => if (i % 3 == 0) 0 else 255))
    assert(GifCodec.decodeGif(GifCodec.encodeGif(bw)).get
      .luma.toSeq === bw.luma.toSeq)
  }

  test("interlaced round trips are bit-exact (stills and animations)") {
    // odd heights exercise every pass-boundary case of the 4-pass
    // Appendix-E schedule (h < 8 leaves late passes dominant)
    for ((w, h) <- Seq((16, 16), (13, 7), (9, 3), (20, 1), (33, 29))) {
      val img = noisy(w, h, w + h * 7)
      val enc = GifCodec.encodeGif(img, interlaced = true)
      assert(GifCodec.decodeGif(enc).get.luma.toSeq === img.luma.toSeq,
        s"${w}x$h")
      // the interlaced bytes differ from progressive but pixels agree
      assert(!enc.sameElements(GifCodec.encodeGif(img)))
    }
    val frames = evolved(21, 4)
    val dec = GifCodec.decodeGifFrames(
      GifCodec.encodeGifAnimated(frames, interlaced = true))
    assert(dec.get.length === 4)
    dec.get.zip(frames).foreach { case (d, e) =>
      assert(d.luma.toSeq === e.luma.toSeq)
    }
  }

  test("scene renderings hash identically across GIF/PNG (the variant property)") {
    val scene = PixelCodec.renderGrid(PixelCodec.sceneGrid(31337L), 64)
    val gif = GifCodec.encodeGif(scene)
    val png = PixelCodec.encodeGray8Png(scene)
    assert(!gif.sameElements(png))
    assert(PixelCodec.phash(gif).get === PixelCodec.phash(png).get)
    // decodePixels dispatches to the GIF tier by content
    assert(PixelCodec.decodePixels(gif).get.luma.toSeq ===
      scene.luma.toSeq)
  }

  test("hostile inputs never throw and decode to None") {
    val good = GifCodec.encodeGif(noisy(16, 16, 9))
    val hostile = Seq[Array[Byte]](
      Array.empty,
      "GIF89a".getBytes("US-ASCII"),           // bare header
      good.take(14),                           // truncated in LSD
      good.take(good.length / 2),              // truncated mid-LZW
      good.dropRight(2),                       // sub-block chain cut
      "NOTAGIFFILE!".getBytes("US-ASCII"),
      Array.fill[Byte](64)(0x2c.toByte))
    hostile.foreach(b => assert(GifCodec.decodeGif(b).isEmpty, b.length))
    // truncation at every byte boundary up to the trailer
    val tiny = GifCodec.encodeGif(Gray(8, 8, Array.fill(64)(42)))
    for (n <- 0 until tiny.length - 1)
      assert(GifCodec.decodeGif(tiny.take(n)).isEmpty, s"take($n)")
  }

  // ---- the animated walker ----

  private def evolved(seed: Int, f: Int): Seq[Gray] = {
    val g = noisy(24, 16, seed)
    (0 until f).map { fno =>
      if (fno > 0) g.luma((fno * 37) % g.luma.length) = (fno * 61) % 256
      Gray(g.width, g.height, g.luma.clone())
    }
  }

  test("animated round trip is frame-exact through delta-rect compositing") {
    val frames = evolved(5, 6)
    val enc = GifCodec.encodeGifAnimated(frames) // deltaRect = true
    val dec = GifCodec.decodeGifFrames(enc)
    assert(dec.isDefined)
    assert(dec.get.length === 6)
    dec.get.zip(frames).zipWithIndex.foreach { case ((d, e), i) =>
      assert(d.width === e.width && d.height === e.height, s"frame $i")
      assert(d.luma.toSeq === e.luma.toSeq, s"frame $i")
    }
    // the delta encoding is REALLY sub-rect: frames 1+ must be smaller
    // than a full-frame re-encode of the same animation
    val full = GifCodec.encodeGifAnimated(frames, deltaRect = false)
    assert(enc.length < full.length)
    // and the full-frame form decodes to the same pixels
    val decFull = GifCodec.decodeGifFrames(full).get
    decFull.zip(frames).foreach { case (d, e) =>
      assert(d.luma.toSeq === e.luma.toSeq)
    }
  }

  test("identical consecutive frames survive the empty-delta path") {
    val g = noisy(16, 16, 2)
    val frames = Seq(g, g, g) // no change: 1x1 no-op rects
    val dec = GifCodec.decodeGifFrames(GifCodec.encodeGifAnimated(frames))
    assert(dec.get.length === 3)
    dec.get.foreach(d => assert(d.luma.toSeq === g.luma.toSeq))
  }

  test("a still decodes as a 1-frame animation through the walker") {
    val g = noisy(16, 12, 11)
    val dec = GifCodec.decodeGifFrames(GifCodec.encodeGif(g))
    assert(dec.get.length === 1)
    assert(dec.get.head.luma.toSeq === g.luma.toSeq)
  }

  test("transparency and disposal-2 composite per the GIF89a rules") {
    // hand-built 2-frame 4x2 animation: global table with 4 colors,
    // frame 1 is a 2x1 sub-rect at (1,0) whose first pixel is
    // transparent (must leave frame 0's pixel) and whose GCE asks for
    // restore-to-background disposal on frame 0's rect beforehand
    def lum(i: Int) = PixelCodec.lum(i * 60, i * 60, i * 60)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](4, 0, 2, 0)) // 4x2 canvas
    out.write(0x81)                    // global table, 4 entries
    out.write(3); out.write(0)         // bg index 3
    for (i <- 0 until 4; _ <- 0 until 3) out.write(i * 60)
    // frame 0: full canvas, indices 0..3,0..3 via GCE disposal 2
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0x08); out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 4, 0, 2, 0, 0))
    out.write(GifCodecSpec.rawLzw(Array(0, 1, 2, 3, 0, 1, 2, 3)))
    // frame 1: 2x1 at (1,0), transparent index 1 then color 2
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0x01); out.write(0); out.write(0); out.write(1); out.write(0)
    out.write(0x2c)
    out.write(Array[Byte](1, 0, 0, 0, 2, 0, 1, 0, 0))
    out.write(GifCodecSpec.rawLzw(Array(1, 2)))
    out.write(0x3b)
    val dec = GifCodec.decodeGifFrames(out.toByteArray)
    assert(dec.isDefined && dec.get.length === 2)
    assert(dec.get.head.luma.toSeq ===
      Seq(lum(0), lum(1), lum(2), lum(3), lum(0), lum(1), lum(2), lum(3)))
    // disposal 2 restored the canvas to bg (index 3) BEFORE frame 1;
    // frame 1's transparent pixel (1,0) shows bg, its second paints 2
    assert(dec.get(1).luma.toSeq ===
      Seq(lum(3), lum(3), lum(2), lum(3), lum(3), lum(3), lum(3), lum(3)))
  }

  test("restore-previous disposal rewinds the canvas between frames") {
    // hand-built 3-frame 2x1 animation on a 4-color global table:
    // frame 0 = [0, 1] (disposal 0); frame 1 paints cell (0,0) = 2
    // under disposal 3 → displays [2, 1] but the canvas REWINDS;
    // frame 2 paints cell (1,0) = 3 → [0, 3], proving frame 1's paint
    // did not persist (disposal 1 would have shown [2, 3])
    def lum(i: Int) = PixelCodec.lum(i * 60, i * 60, i * 60)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](2, 0, 1, 0))
    out.write(0x81); out.write(0); out.write(0)
    for (i <- 0 until 4; _ <- 0 until 3) out.write(i * 60)
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 2, 0, 1, 0, 0))
    out.write(GifCodecSpec.rawLzw(Array(0, 1)))
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0x0c); out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 1, 0, 1, 0, 0))
    out.write(GifCodecSpec.rawLzw(Array(2)))
    out.write(0x2c)
    out.write(Array[Byte](1, 0, 0, 0, 1, 0, 1, 0, 0))
    out.write(GifCodecSpec.rawLzw(Array(3)))
    out.write(0x3b)
    val dec = GifCodec.decodeGifFrames(out.toByteArray)
    assert(dec.isDefined && dec.get.length === 3)
    assert(dec.get(0).luma.toSeq === Seq(lum(0), lum(1)))
    assert(dec.get(1).luma.toSeq === Seq(lum(2), lum(1)))
    assert(dec.get(2).luma.toSeq === Seq(lum(0), lum(3)))
  }

  test("seeded fuzz: random bytes and random tails never throw") {
    val rnd = new scala.util.Random(0x61f)
    val good = GifCodec.encodeGifAnimated(evolved(3, 3))
    for (_ <- 0 until 300) {
      val n = rnd.nextInt(400)
      val junk = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      GifCodec.decodeGif(junk)        // must not throw
      GifCodec.decodeGifFrames(junk)  // must not throw
      // a valid prefix with a corrupted tail: flip bytes after the
      // header region and decode both ways
      val cut = 14 + rnd.nextInt(good.length - 14)
      val mut = good.clone()
      mut(cut) = rnd.nextInt(256).toByte
      GifCodec.decodeGif(mut)
      GifCodec.decodeGifFrames(mut).foreach { fs =>
        // when a mutation still decodes, the result must stay shaped
        assert(fs.nonEmpty && fs.forall(f =>
          f.luma.length == f.width * f.height))
      }
    }
  }

  test("hostile animations return None; the frame-count bound holds") {
    val frames = evolved(9, 3)
    val enc = GifCodec.encodeGifAnimated(frames)
    // truncation at every byte boundary never throws, never decodes
    for (n <- 0 until enc.length - 1)
      assert(GifCodec.decodeGifFrames(enc.take(n)).isEmpty, s"take($n)")
    // frame-count bound
    assert(GifCodec.decodeGifFrames(enc, maxFrames = 2).isEmpty)
    assert(GifCodec.decodeGifFrames(enc, maxFrames = 3).isDefined)
  }
}

object GifCodecSpec {
  /** Minimal fixed-width LZW for the hand-built stream: emit clear,
    * then every index as its own root code, then end — legal (if
    * uncompressed) GIF LZW at minCode 2, wrapped as one sub-block.
    * Width bookkeeping mirrors the decoder's one-behind rule. */
  private def rawLzw(indices: Array[Int]): Array[Byte] = {
    val minCode = 2
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0; var width = minCode + 1
    var nextCode = (1 << minCode) + 2
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += width
      while (accBits >= 8) {
        bits.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8
      }
    }
    put(1 << minCode) // clear
    var prev = -1
    indices.foreach { k =>
      put(k)
      if (prev >= 0 && nextCode < 4096) { // decoder grows its dict too
        nextCode += 1
        if (width < 12 && nextCode == (1 << width)) width += 1
      }
      prev = k
    }
    put((1 << minCode) + 1) // end
    if (accBits > 0) bits.write((acc & 0xff).toInt)
    val raw = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(minCode)
    out.write(raw.length); out.write(raw, 0, raw.length)
    out.write(0)
    out.toByteArray
  }
}
