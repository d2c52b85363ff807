package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Mp3Codec, Mp4Codec}

/** The MP3 digest tier: frame-grammar walk, re-tag invariance (the
  * canonical crawl MP3 duplicate), digest-formula pinning, and the
  * strict tiling / hostile-input discipline. */
class Mp3CodecSpec extends AnyFunSuite {

  test("re-tagged copies fingerprint identically; tags never leak " +
      "into content") {
    val plain = Mp3Codec.encodeMp3(75L, 4, kbps = 64)
    val tagged = Mp3Codec.encodeMp3(75L, 4, kbps = 64,
      id3v2 = true, id3v1 = true)
    val v2only = Mp3Codec.encodeMp3(75L, 4, kbps = 64, id3v2 = true)
    val v1only = Mp3Codec.encodeMp3(75L, 4, kbps = 64, id3v1 = true)
    assert(!plain.sameElements(tagged))
    val dp = Mp3Codec.decodeMp3Digest(plain).get
    val dt = Mp3Codec.decodeMp3Digest(tagged).get
    assert(dp.fingerprint === dt.fingerprint)
    assert(dp.fingerprint ===
      Mp3Codec.decodeMp3Digest(v2only).get.fingerprint)
    assert(dp.fingerprint ===
      Mp3Codec.decodeMp3Digest(v1only).get.fingerprint)
    assert(dp.version === 10 && dp.layer === 3)
    assert(dp.sampleRate === 32000 && dp.channels === 1)
    assert(dp.kbps === 64 && !dp.vbr)
    assert(dp.frameDigests.length === 4)
    // different content / frame count / bitrate → different prints
    assert(dp.fingerprint !==
      Mp3Codec.decodeMp3Digest(Mp3Codec.encodeMp3(76L, 4)).get
        .fingerprint)
    assert(dp.fingerprint !==
      Mp3Codec.decodeMp3Digest(Mp3Codec.encodeMp3(75L, 3)).get
        .fingerprint)
    assert(dp.fingerprint !==
      Mp3Codec.decodeMp3Digest(Mp3Codec.encodeMp3(75L, 4, kbps = 96))
        .get.fingerprint)
  }

  test("a leading Xing/LAME VBR-header frame is metadata: excluded " +
      "from the fingerprint, like tags") {
    val plain = Mp3Codec.decodeMp3Digest(
      Mp3Codec.encodeMp3(42L, 3)).get
    val xing = Mp3Codec.decodeMp3Digest(
      Mp3Codec.encodeMp3(42L, 3, xingHeader = true)).get
    assert(xing.frameDigests.length === 3)      // audio frames only
    assert(xing.fingerprint === plain.fingerprint)
    val all = Mp3Codec.decodeMp3Digest(Mp3Codec.encodeMp3(
      42L, 3, id3v2 = true, id3v1 = true, xingHeader = true)).get
    assert(all.fingerprint === plain.fingerprint)
    // a stream that is ONLY a Xing frame has no content: None
    assert(Mp3Codec.decodeMp3Digest(
      Mp3Codec.encodeMp3(42L, 1, xingHeader = true)
        .dropRight(288)).isEmpty)
  }

  test("the digest matches the oracle formula") {
    val d = Mp3Codec.decodeMp3Digest(Mp3Codec.encodeMp3(100L, 2)).get
    // frame data = "mp3:{s}:{k}:" + md5("m{s}_{k}") dot-padded to 284
    val head = "mp3:100:1:" + Mp4Codec.md5Hex("m100_1".getBytes("UTF-8"))
    val payload = head + "." * (284 - head.length)
    assert(d.frameDigests(1) ===
      Mp4Codec.md5Hex(payload.getBytes("US-ASCII")))
    assert(d.fingerprint ===
      Mp4Codec.md5Hex(d.frameDigests.mkString("").getBytes("US-ASCII")))
  }

  test("MPEG-2 L3 (halved length rule) and MPEG-1 Layer I (x4 slot " +
      "rule) encode, walk, and re-tag-collapse") {
    // V2 L3 @ 24 kHz 64 kbps: frameLen = 72*64000/24000 = 192
    val v2 = Mp3Codec.encodeMp3(50L, 3, 64, version = 20)
    assert(v2.length === 3 * 192)
    val d2 = Mp3Codec.decodeMp3Digest(v2).get
    assert(d2.version === 20 && d2.layer === 3)
    assert(d2.sampleRate === 24000 && d2.kbps === 64)
    assert(d2.frameDigests.length === 3)
    // the digest formula at the V2 data length (192 - 4 = 188)
    val head = "mp3:50:1:" + Mp4Codec.md5Hex("m50_1".getBytes("UTF-8"))
    assert(d2.frameDigests(1) === Mp4Codec.md5Hex(
      (head + "." * (188 - head.length)).getBytes("US-ASCII")))
    // the re-tagged V2 twin collapses
    val v2t = Mp3Codec.encodeMp3(50L, 3, 64, id3v2 = true,
      id3v1 = true, version = 20)
    assert(!v2t.sameElements(v2))
    assert(Mp3Codec.decodeMp3Digest(v2t).get.fingerprint ===
      d2.fingerprint)
    // V1 L1 @ 32 kHz 96 kbps: frameLen = (12*96000/32000)*4 = 144
    val l1 = Mp3Codec.encodeMp3(50L, 3, 96, layer = 1)
    assert(l1.length === 3 * 144)
    val d1 = Mp3Codec.decodeMp3Digest(l1).get
    assert(d1.version === 10 && d1.layer === 1)
    assert(d1.sampleRate === 32000 && d1.kbps === 96)
    assert(d1.frameDigests.length === 3)
    // same scene, different (version, layer) framing → different
    // data lengths → DISTINCT fingerprints (each family its own
    // primary, never cross-collapsing)
    val v1 = Mp3Codec.decodeMp3Digest(Mp3Codec.encodeMp3(50L, 3)).get
    assert(Set(v1.fingerprint, d2.fingerprint, d1.fingerprint)
      .size === 3)
    // truncation discipline holds on both new forms
    assert(Mp3Codec.decodeMp3Digest(v2.take(v2.length - 50)).isEmpty)
    assert(Mp3Codec.decodeMp3Digest(l1.take(l1.length - 50)).isEmpty)
    assert(Mp3Codec.decodeMp3Digest(v2.take(192))
      .exists(_.frameDigests.length == 1))
  }

  test("CRC-present frames parse with the CRC slot skipped") {
    // hand-build one frame with protection_bit = 0 (CRC present):
    // the digest must cover the data AFTER the 2 CRC bytes
    val frameLen = 288
    val data = ("crc-frame-content" + "." * 1000).take(frameLen - 6)
      .getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xfa)           // MPEG-1 L3, CRC present
    out.write((5 << 4) | (2 << 2))             // 64 kbps, 32 kHz
    out.write(3 << 6)                          // mono
    out.write(0xbe); out.write(0xef)           // CRC slot (not verified)
    out.write(data)
    val d = Mp3Codec.decodeMp3Digest(out.toByteArray)
    assert(d.isDefined)
    assert(d.get.frameDigests.head === Mp4Codec.md5Hex(data))
  }

  test("VBR streams parse; version/layer/samplerate changes reject") {
    // two frames at different bitrates: legal VBR
    val f64 = Mp3Codec.encodeMp3(5L, 1, kbps = 64)
    val f96 = Mp3Codec.encodeMp3(5L, 1, kbps = 96)
    val vbr = Mp3Codec.decodeMp3Digest(f64 ++ f96)
    assert(vbr.exists(_.vbr))
    assert(vbr.get.kbps === 64)                // first frame's rate
    // splicing a frame with a different samplerate index must reject
    val bad = f64.clone()
    val second = f96.clone()
    second(2) = ((5 << 4) | (0 << 2)).toByte   // 44.1 kHz
    assert(Mp3Codec.decodeMp3Digest(bad ++ second).isEmpty)
  }

  test("a final frame containing 'TAG' 128 bytes from EOF is NOT an " +
      "ID3v1 trailer: the untrimmed tiling wins") {
    // 3 × 288-byte frames; the bytes at len-128 sit inside frame 3's
    // payload — overwriting them with 'TAG' leaves a legal stream
    // that only parses if the walk tries the untrimmed extent first
    val good = Mp3Codec.encodeMp3(21L, 3)
    assert(good.length === 864)
    val m = good.clone()
    m(736) = 'T'; m(737) = 'A'; m(738) = 'G'
    val d = Mp3Codec.decodeMp3Digest(m)
    assert(d.exists(_.frameDigests.length == 3))
    // frames 0/1 digest unchanged; frame 2 digests the modified bytes
    val ref = Mp3Codec.decodeMp3Digest(good).get
    assert(d.get.frameDigests.take(2) === ref.frameDigests.take(2))
    assert(d.get.frameDigests(2) !== ref.frameDigests(2))
    // the retry path still strips a REAL trailer (128 tag bytes that
    // cannot tile as frames)
    val tagged = Mp3Codec.encodeMp3(21L, 3, id3v1 = true)
    assert(Mp3Codec.decodeMp3Digest(tagged).get.fingerprint ===
      ref.fingerprint)
  }

  test("strict tiling: truncation, slack, and bad fields reject") {
    val good = Mp3Codec.encodeMp3(9L, 3)
    assert(Mp3Codec.decodeMp3Digest(good).isDefined)
    // truncation at every byte below the full length; a cut landing
    // exactly on a frame boundary is a legal SHORTER stream (the
    // WARC record-boundary precedent) and must parse with that many
    // frames — anything else must be None
    var n = 0
    while (n < good.length) {
      val r = Mp3Codec.decodeMp3Digest(good.take(n))
      if (n > 0 && n % 288 == 0)
        assert(r.exists(_.frameDigests.length == n / 288), s"@$n")
      else assert(r.isEmpty, s"@$n")
      n += 1
    }
    // trailing slack that is not an ID3v1 tag
    assert(Mp3Codec.decodeMp3Digest(good ++ "x".getBytes).isEmpty)
    assert(Mp3Codec.decodeMp3Digest(
      good ++ new Array[Byte](128)).isEmpty)
    // free-format bitrate index
    val free = good.clone(); free(2) = (0 << 4 | 2 << 2).toByte
    assert(Mp3Codec.decodeMp3Digest(free).isEmpty)
    // reserved version bits
    val rv = good.clone(); rv(1) = 0xeb.toByte
    assert(Mp3Codec.decodeMp3Digest(rv).isEmpty)
    // broken sync
    val bs = good.clone(); bs(0) = 0x7f
    assert(Mp3Codec.decodeMp3Digest(bs).isEmpty)
    // non-syncsafe ID3v2 size byte
    val tagged = Mp3Codec.encodeMp3(9L, 3, id3v2 = true)
    val nss = tagged.clone(); nss(6) = 0x80.toByte
    assert(Mp3Codec.decodeMp3Digest(nss).isEmpty)
    // WAV/FLAC payloads are not MP3
    assert(Mp3Codec.decodeMp3Digest("RIFF....WAVE".getBytes).isEmpty)
    assert(Mp3Codec.decodeMp3Digest(Array.empty[Byte]).isEmpty)
    // seeded fuzz never throws
    val r = new scala.util.Random(0x33)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](r.nextInt(600) + 4)
      r.nextBytes(junk)
      junk(0) = 0xff.toByte
      junk(1) = (junk(1) | 0xe0).toByte
      Mp3Codec.decodeMp3Digest(junk)
    }
  }
}
