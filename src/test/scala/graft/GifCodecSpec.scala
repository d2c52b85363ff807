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
    // interlace flag set in the image descriptor: the open seam
    val idOff = {
      var p = 13 + (2 << (good(10) & 7)) * 3 // header+LSD+global table
      while ((good(p) & 0xff) != 0x2c) {     // skip extensions
        p += 2
        while ((good(p) & 0xff) != 0) p += 1 + (good(p) & 0xff)
        p += 1
      }
      p
    }
    assert((good(idOff) & 0xff) === 0x2c)
    assert(GifCodec.decodeGif(
      good.updated(idOff + 9,
        (good(idOff + 9) | 0x40).toByte)).isEmpty)
    // truncation at every byte boundary up to the trailer
    val tiny = GifCodec.encodeGif(Gray(8, 8, Array.fill(64)(42)))
    for (n <- 0 until tiny.length - 1)
      assert(GifCodec.decodeGif(tiny.take(n)).isEmpty, s"take($n)")
  }
}
