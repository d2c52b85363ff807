package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal._
import graft.multimodal.PixelCodec.Gray

/** The lossy-WebP (VP8 key frame) tier: bool-coder and tree
  * round-trips, the exact integer transform properties the fixture
  * argument rests on, full encode→decode pixel identity across the
  * quantizer/partition/skip dials, cross-format identity with the
  * PNG rendering, and hostile-input discipline. */
class Vp8CodecSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("bool coder round-trips arbitrary bit/probability sequences") {
    val r = rng(0x1337)
    val probs = Array.fill(5000)(1 + r.nextInt(254))
    val bits = Array.fill(5000)(r.nextInt(2))
    val e = new Vp8Entropy.BoolEncoder
    var i = 0
    while (i < bits.length) { e.bool(probs(i), bits(i)); i += 1 }
    val bytes = e.finish()
    val d = new Vp8Entropy.BoolDecoder(bytes, 0, bytes.length)
    i = 0
    while (i < bits.length) {
      assert(d.bool(probs(i)) === bits(i), s"bit $i")
      i += 1
    }
    assert(!d.overran)
  }

  test("literals and trees round-trip") {
    val r = rng(0xbeef)
    val e = new Vp8Entropy.BoolEncoder
    val lits = Array.fill(200)(r.nextInt(256))
    lits.foreach(v => e.literal(8, v))
    val toks = Array.fill(300)(r.nextInt(12))
    val probs = Array.fill(11)(1 + r.nextInt(254))
    toks.foreach(t => e.tree(Vp8Tables.CoefTree, probs, t))
    val modes = Array.fill(100)(r.nextInt(10))
    modes.foreach(m =>
      e.tree(Vp8Tables.BmodeTree, Vp8Tables.KfBmodeProb(0)(0), m))
    val bytes = e.finish()
    val d = new Vp8Entropy.BoolDecoder(bytes, 0, bytes.length)
    lits.foreach(v => assert(d.literal(8) === v))
    toks.foreach(t => assert(d.tree(Vp8Tables.CoefTree, probs) === t))
    modes.foreach(m => assert(
      d.tree(Vp8Tables.BmodeTree, Vp8Tables.KfBmodeProb(0)(0)) === m))
    assert(!d.overran)
  }

  test("IDCT of a DC-only block is exactly (8r+4)>>3 = r, both signs") {
    val out = new Array[Int](16)
    for (r <- Seq(-255, -100, -1, 0, 1, 77, 255)) {
      val c = new Array[Int](16)
      c(0) = 8 * r
      Vp8Codec.idct4x4(c, out)
      assert(out.forall(_ == r), s"r=$r → ${out.toSeq}")
    }
  }

  test("inverse WHT of a DC-only Y2 block lands 8r in every subblock") {
    val out = new Array[Int](16)
    for (r <- Seq(-200, -3, 0, 5, 127)) {
      val c = new Array[Int](16)
      c(0) = 64 * r
      Vp8Codec.iwalsh(c, out)
      assert(out.forall(_ == 8 * r), s"r=$r → ${out.toSeq}")
    }
  }

  private def sceneGray(id: Long, size: Int): Gray = {
    val grid = PixelCodec.sceneGrid(id)
    PixelCodec.renderGrid(grid, size)
  }

  test("VP8 encode→decode is pixel-exact on tile-constant scenes " +
      "across quantizer/partition/skip dials") {
    for {
      (id, size) <- Seq((25L, 64), (50L, 32), (75L, 64))
      qi <- Seq(0, 4)
      nParts <- Seq(1, 2, 4)
      skip <- Seq(false, true)
    } {
      val g = sceneGray(id, size)
      val webp = Vp8Encoder.encodeWebpLossy(g, qi = qi, nParts = nParts,
        skipFlags = skip)
      val back = WebpCodec.decodeWebp(webp)
      assert(back.isDefined, s"id=$id qi=$qi parts=$nParts skip=$skip")
      assert(back.get.width === g.width && back.get.height === g.height)
      assert(back.get.luma.sameElements(g.luma),
        s"id=$id qi=$qi parts=$nParts skip=$skip")
    }
  }

  test("all 14 intra prediction laws round-trip exactly via " +
      "encoder mode sniffing") {
    val r = rng(0x14)
    // 16×16 V/H/TM: content constructed as the exact mode prediction
    // from an arbitrary seeded top MB row
    val w = 48; val h = 48
    val base = Array.tabulate(w * h) { i =>
      if (i / w < 16) ((i % w) / 4 * 37 + (i / w) / 4 * 101) % 256
      else 0
    }
    def fill(mode: Int): Gray = {
      val px = base.clone()
      var y = 16
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = mode match {
            case 1 => px(15 * w + x)                 // V: extend row 15
            case 2 => px(y * w + math.min(x, 15))    // H-ish rows
            case _ => px(15 * w + x)
          }
          x += 1
        }
        y += 1
      }
      Gray(w, h, px)
    }
    // V_PRED: rows 16+ equal row 15 → MB rows 1-2 are exact vertical
    // extensions (and non-uniform, so DC can't claim them)
    val gv = fill(1)
    assert(WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(gv))
      .exists(_.luma.sameElements(gv.luma)))
    // H_PRED: build columns 16+ as copies of column 15
    val gh = {
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        if (x < 16) (x / 4 * 53 + y / 4 * 29) % 256 else -1
      }
      var y = 0
      while (y < h) {
        var x = 16
        while (x < w) { px(y * w + x) = px(y * w + 15); x += 1 }
        y += 1
      }
      Gray(w, h, px)
    }
    assert(WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(gh))
      .exists(_.luma.sameElements(gh.luma)))
    // B_PRED submodes: synthesize content by APPLYING each predictor
    // with zero residual from a seeded border — whatever exact mode
    // the sniffer picks, the round trip must land the identical
    // pixels. Build several frames with different seeds/mode mixes.
    for (seed <- Seq(1, 2, 3)) {
      val rr = rng(seed)
      val size = 32
      val mbCols = size / 16
      val plane = new Array[Int](size * size)
      // seeded top-left content (tile-constant so B_DC stays legal)
      var i = 0
      while (i < size * size) {
        val x = i % size; val y = i / size
        plane(i) = ((x / 4) * 31 + (y / 4) * 17 + seed * 7) % 256
        i += 1
      }
      // overwrite interior subblocks with pure predictor outputs
      for {
        sy <- 1 until size / 4
        sx <- 1 until size / 4
      } {
        val mode = 1 + rr.nextInt(9)  // a non-DC submode
        val px = sx * 4; val py = sy * 4
        val pred = Vp8Codec.predictBValues(plane, size, px, py, mode,
          px / 16)
        var k = 0
        while (k < 16) {
          plane((py + k / 4) * size + px + k % 4) = pred(k)
          k += 1
        }
      }
      val g = Gray(size, size, plane)
      val back = WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(g))
      assert(back.exists(_.luma.sameElements(g.luma)), s"seed=$seed")
    }
  }

  test("4-segment quantization round-trips exactly through the " +
      "segment map and per-segment dequant") {
    for ((id, size) <- Seq((25L, 64), (50L, 32))) {
      val g = sceneGray(id, size)
      for (qi <- Seq(0, 4); skip <- Seq(false, true)) {
        val webp = Vp8Encoder.encodeWebpLossy(g, qi = qi,
          skipFlags = skip, segmented = true)
        val back = WebpCodec.decodeWebp(webp)
        assert(back.exists(_.luma.sameElements(g.luma)),
          s"id=$id qi=$qi skip=$skip")
        // segmentation changes the bitstream vs the unsegmented form
        assert(!webp.sameElements(
          Vp8Encoder.encodeWebpLossy(g, qi = qi, skipFlags = skip)))
      }
    }
  }

  test("coefficient-probability updates in the header round-trip " +
      "exactly (decode honors the updated values)") {
    val g = sceneGray(75L, 64)
    // shift probabilities the DC tokens actually ride: plane 3
    // (B_PRED Y), bands 0-1, all contexts and several tree nodes
    val updates = for {
      j <- Seq(0, 1); k <- Seq(0, 1, 2); l <- Seq(0, 1, 2, 5)
    } yield (3, j, k, l, 77 + 13 * l)
    val webp = Vp8Encoder.encodeWebpLossy(g, probUpdates = updates)
    assert(WebpCodec.decodeWebp(webp).exists(
      _.luma.sameElements(g.luma)))
    // control: the stream differs from the no-update form
    assert(!webp.sameElements(Vp8Encoder.encodeWebpLossy(g)))
  }

  test("uniform images ride the 16×16 DC_PRED + Y2 WHT path exactly") {
    for (v <- Seq(0, 1, 17, 128, 254, 255); qi <- Seq(0, 4)) {
      val g = Gray(48, 48, Array.fill(48 * 48)(v))
      val back = WebpCodec.decodeWebp(
        Vp8Encoder.encodeWebpLossy(g, qi = qi, skipFlags = true))
      assert(back.exists(_.luma.forall(_ == v)), s"v=$v qi=$qi")
    }
  }

  test("non-MB-aligned dimensions pad and crop exactly") {
    // 4×4-constant content at odd frame dims: replication padding
    // keeps every subblock constant, so the round trip stays exact
    for ((w, h) <- Seq((52, 45), (17, 9), (64, 4), (4, 64), (1, 1))) {
      val g = Gray(w, h, Array.tabulate(w * h) { i =>
        ((i % w) / 4 * 37 + (i / w) / 4 * 101) % 256
      })
      val back = WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(g))
      assert(back.isDefined, s"${w}x$h")
      assert(back.get.width === w && back.get.height === h)
      assert(back.get.luma.sameElements(g.luma), s"${w}x$h")
    }
  }

  test("lossy WebP decodes to the identical pixels as the PNG " +
      "rendering (cross-format copy)") {
    val g = sceneGray(100L, 64)
    val png = PixelCodec.decodePng(PixelCodec.encodeGray8Png(g)).get
    val vp8 = WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(g)).get
    assert(vp8.luma.sameElements(png.luma))
  }

  test("lossy frames composite inside animated WebP clips") {
    val g = sceneGray(125L, 32)
    val webp = Vp8Encoder.encodeWebpLossy(g)
    val frames = WebpCodec.decodeWebpFrames(webp)
    assert(frames.exists(f =>
      f.length == 1 && f.head.luma.sameElements(g.luma)))
  }

  test("container truncation at every byte returns None, never throws") {
    val g = sceneGray(150L, 32)
    val webp = Vp8Encoder.encodeWebpLossy(g, nParts = 2)
    // cuts inside the payload must be None; a cut that removes only
    // the RIFF pad byte leaves the full bitstream present and may
    // legally decode
    val payloadEnd = 20 + ((webp(16) & 0xff) | ((webp(17) & 0xff) << 8) |
      ((webp(18) & 0xff) << 16))
    var n = 0
    while (n < webp.length) {
      val r = WebpCodec.decodeWebp(webp.take(n))
      if (n < payloadEnd) assert(r.isEmpty, s"@$n")
      n += 1
    }
    assert(WebpCodec.decodeWebp(webp).isDefined)
  }

  test("raw-payload truncation never throws; deep cuts are None") {
    val g = sceneGray(175L, 64)
    val webp = Vp8Encoder.encodeWebpLossy(g)
    // strip the RIFF wrap: payload starts at 20
    val payload = webp.drop(20)
    var n = 0
    while (n < payload.length - 3) {
      // the bool coder's legal 2-byte lookahead means the last couple
      // of flush bytes may be reconstructible; anything deeper is None
      val r = Vp8Codec.decodeFrame(payload, 0, n)
      assert(r.isEmpty, s"@$n")
      n += 1
    }
  }

  test("hostile inputs never throw: header fuzz and bit flips") {
    val g = sceneGray(200L, 32)
    val webp = Vp8Encoder.encodeWebpLossy(g)
    val r = rng(0xdead)
    // interframe bit, bad start code, oversized dims
    val t1 = webp.clone(); t1(20) = (t1(20) | 1).toByte
    assert(WebpCodec.decodeWebp(t1).isEmpty)
    val t2 = webp.clone(); t2(23) = 0x00
    assert(WebpCodec.decodeWebp(t2).isEmpty)
    var i = 0
    while (i < 400) {
      val t = webp.clone()
      val at = 20 + r.nextInt(t.length - 20)
      t(at) = (t(at) ^ (1 << r.nextInt(8))).toByte
      WebpCodec.decodeWebp(t) // any Option is fine; must not throw
      i += 1
    }
    i = 0
    while (i < 200) {
      val junk = new Array[Byte](8 + r.nextInt(120))
      r.nextBytes(junk)
      Vp8Codec.decodeFrame(junk, 0, junk.length)
      i += 1
    }
  }

  test("loop filter: flat content is invariant at any level; edges " +
      "stay in range") {
    // a uniform frame has zero gradients everywhere: every mask may
    // pass but every adjustment is 0, so filtering must be identity
    for {
      lvl <- Seq(10, 40, 63)
      simple <- Seq(false, true)
      sharp <- Seq(0, 3, 7)
    } {
      val g = Gray(48, 48, Array.fill(48 * 48)(93))
      val back = WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(
        g, filterLevel = lvl, simpleFilter = simple, sharpness = sharp))
      assert(back.exists(_.luma.forall(_ == 93)),
        s"lvl=$lvl simple=$simple sharp=$sharp")
    }
    // tile content under filtering: lossy (as intended) but sane
    val g = sceneGray(225L, 64)
    for (simple <- Seq(false, true)) {
      val back = WebpCodec.decodeWebp(Vp8Encoder.encodeWebpLossy(
        g, filterLevel = 32, simpleFilter = simple))
      assert(back.isDefined)
      assert(back.get.luma.forall(v => v >= 0 && v <= 255))
      // deblocking smooths tile edges: most interior mass unchanged
      val diff = back.get.luma.zip(g.luma).count { case (a, b) => a != b }
      assert(diff < g.luma.length / 2, s"diff=$diff simple=$simple")
    }
  }

  test("every B-mode prediction law matches fixed known-answer " +
      "vectors (independent of the implementation)") {
    // neighbors chosen by hand: above A0..A7 = 10..80, left L0..L3 =
    // 100..130, corner 90; the subblock sits at (4,4) in a 32-wide
    // plane so every neighbor is a real pixel (no edge constants) and
    // above-right is the normal in-plane case. Expected 4x4 outputs
    // are hand-computed from the RFC 6386 SS12.3 laws
    // (avg2(x,y) = (x+y+1)>>1, avg3(x,y,z) = (x+2y+z+2)>>2) -- NOT
    // derived by calling the decoder.
    import Vp8Tables._
    val stride = 32
    val plane = new Array[Int](stride * 8)
    for (i <- 0 until 8) plane(3 * stride + 4 + i) = 10 * (i + 1)
    for (j <- 0 until 4) plane((4 + j) * stride + 3) = 100 + 10 * j
    plane(3 * stride + 3) = 90
    val expected: Map[Int, Seq[Int]] = Map(
      BDcPred -> Seq.fill(16)(70),            // (560+4)>>3
      BTmPred -> Seq(
        20, 30, 40, 50,
        30, 40, 50, 60,
        40, 50, 60, 70,
        50, 60, 70, 80),
      BVePred -> Seq(
        33, 20, 30, 40,
        33, 20, 30, 40,
        33, 20, 30, 40,
        33, 20, 30, 40),
      BHePred -> Seq(
        100, 100, 100, 100,
        110, 110, 110, 110,
        120, 120, 120, 120,
        128, 128, 128, 128),
      BLdPred -> Seq(
        20, 30, 40, 50,
        30, 40, 50, 60,
        40, 50, 60, 70,
        50, 60, 70, 78),
      BRdPred -> Seq(
        73, 33, 20, 30,
        100, 73, 33, 20,
        110, 100, 73, 33,
        120, 110, 100, 73),
      BVrPred -> Seq(
        50, 15, 25, 35,
        73, 33, 20, 30,
        100, 50, 15, 25,
        110, 73, 33, 20),
      BVlPred -> Seq(
        15, 25, 35, 45,
        20, 30, 40, 50,
        25, 35, 45, 60,
        30, 40, 50, 70),
      BHdPred -> Seq(
        95, 73, 33, 20,
        105, 100, 95, 73,
        115, 110, 105, 100,
        125, 120, 115, 110),
      BHuPred -> Seq(
        105, 110, 115, 120,
        115, 120, 125, 128,
        125, 128, 130, 130,
        130, 130, 130, 130))
    for ((mode, want) <- expected) {
      val got = Vp8Codec.predictBValues(plane, stride, 4, 4, mode, 0)
      assert(got.toSeq === want, s"B-mode $mode")
    }
  }
}
