package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AudioCodec, FlacCodec}

/** The FLAC tier: lossless sample round-trips across subframe types
  * (constant / fixed order-2 Rice / verbatim), the three stereo
  * decorrelation modes, metadata-block skipping, envelope/fingerprint
  * identity with the WAV rendering of the same samples, and the
  * hostile-input discipline (CRC-8/CRC-16 mismatch, truncation at
  * every byte, reserved types, fuzz). */
class FlacCodecSpec extends AnyFunSuite {

  private def noisySamples(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n)(i =>
      ((i * 2654435761L + seed * 40503L) % 60000 - 30000).toInt)

  test("mono round-trips bit-exactly across frame boundaries and subframe types") {
    // lengths chosen to hit: single short frame, exact multiple of the
    // block size, and a short trailing frame; index-rotation inside
    // the encoder covers fixed-order-2, verbatim, AND order-2 LPC
    // frames (≥4 blocks at n ≥ 2048: the %4 rotation lands each type)
    for (n <- Seq(64, 512, 1024, 1600, 2531)) {
      val s = noisySamples(n, n)
      val d = FlacCodec.decodeFlac16(FlacCodec.encodeFlac16(s, 8000, 1))
      assert(d.isDefined, s"n=$n")
      assert(d.get.sampleRate === 8000)
      assert(d.get.samples.toSeq === s.toSeq, s"n=$n")
    }
    // constant subframes: a flat signal and a flat tail block
    val flat = Array.fill(700)(-12345)
    assert(FlacCodec.decodeFlac16(FlacCodec.encodeFlac16(flat, 8000, 1))
      .get.samples.toSeq === flat.toSeq)
  }

  test("stereo: all three decorrelation modes downmix to the exact integer mean") {
    // ≥3 blocks so the encoder's rotation emits independent,
    // left/side, AND mid/side frames
    val n = 512 * 3 + 77
    val inter = new Array[Int](n * 2)
    val l = noisySamples(n, 7)
    val r = noisySamples(n, 13)
    var i = 0
    while (i < n) { inter(i * 2) = l(i); inter(i * 2 + 1) = r(i); i += 1 }
    val d = FlacCodec.decodeFlac16(FlacCodec.encodeFlac16(inter, 16000, 2))
    assert(d.isDefined)
    val expect = Array.tabulate(n)(i => Math.floorDiv(l(i) + r(i), 2))
    assert(d.get.samples.toSeq === expect.toSeq)
    // identical downmix to the WAV encoding of the same interleaved
    // frames — the cross-container identity the fixture tier leans on
    val wav = AudioCodec.decodePcmWav(
      AudioCodec.encodeWav16(inter, 16000, 2)).get
    assert(d.get.samples.toSeq === wav.samples.toSeq)
  }

  test("FLAC and WAV renderings of one scene fingerprint identically") {
    val env = AudioCodec.sceneEnvelope(4242L)
    val mono = AudioCodec.renderEnvelope(env, 1600)
    val flac = FlacCodec.encodeFlac16(mono, 8000, 1)
    val wav = AudioCodec.encodeWav16(mono, 8000, 1)
    assert(!flac.sameElements(wav))
    assert(AudioCodec.afp(flac).isDefined)
    assert(AudioCodec.afp(flac) === AudioCodec.afp(wav))
    // a PADDING metadata block (the re-encode variant) is skipped
    val padded = FlacCodec.encodeFlac16(mono, 8000, 1, metaPadding = 64)
    assert(!padded.sameElements(flac))
    assert(AudioCodec.afp(padded) === AudioCodec.afp(wav))
  }

  test("hostile inputs never throw and decode to None") {
    val mono = noisySamples(1600, 3)
    val good = FlacCodec.encodeFlac16(mono, 8000, 1)
    assert(FlacCodec.decodeFlac16(good).isDefined)
    // truncation at EVERY byte boundary
    for (n <- 0 until good.length)
      assert(FlacCodec.decodeFlac16(good.take(n)).isEmpty, s"take($n)")
    // frame CRC-16 damage: flip a bit in the last two bytes
    val c16 = good.updated(good.length - 1,
      (good(good.length - 1) ^ 1).toByte)
    assert(FlacCodec.decodeFlac16(c16).isEmpty)
    // header CRC-8 damage: flip the blocking-strategy-adjacent header
    // byte of the first frame (STREAMINFO is 4 + 4 + 34 bytes in)
    val hdrAt = 42 + 2
    val c8 = good.updated(hdrAt, (good(hdrAt) ^ 0x02).toByte)
    assert(FlacCodec.decodeFlac16(c8).isEmpty)
    // sample-data damage inside a frame body must fail the CRC-16
    val mid = good.updated(60, (good(60) ^ 0x10).toByte)
    assert(FlacCodec.decodeFlac16(mid).isEmpty)
    assert(FlacCodec.decodeFlac16(Array.empty).isEmpty)
    assert(FlacCodec.decodeFlac16("fLaX not flac".getBytes).isEmpty)
    assert(FlacCodec.decodeFlac16(
      AudioCodec.encodeWav16(mono, 8000, 1)).isEmpty)
    // seeded-random fuzz behind a valid magic: never throws
    val rnd = new scala.util.Random(909)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](rnd.nextInt(300) + 4)
      rnd.nextBytes(junk)
      junk(0) = 'f'; junk(1) = 'L'; junk(2) = 'a'; junk(3) = 'C'
      FlacCodec.decodeFlac16(junk) // no throw is the assertion
    }
    // corrupted tails of a valid stream: no throws, mostly None (CRC)
    for (off <- 46 until good.length by 3) {
      val mut = good.updated(off, (good(off) ^ 0x40).toByte)
      FlacCodec.decodeFlac16(mut)
    }
  }

  test("WAV path is unaffected and FLAC joins the afp seam") {
    val env = AudioCodec.sceneEnvelope(7L)
    val mono = AudioCodec.renderEnvelope(env, 1600)
    val viaWav = AudioCodec.afp(AudioCodec.encodeWav16(mono, 8000, 1))
    val viaFlac = AudioCodec.afp(FlacCodec.encodeFlac16(mono, 8000, 1))
    assert(viaWav.isDefined && viaWav === viaFlac)
    assert(AudioCodec.afp("neither container".getBytes).isEmpty)
  }
}
