package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Mp4Codec, OggCodec}

/** The Ogg/Vorbis digest tier: CRC-verified page walk, packet
  * reassembly across 255-continuations, re-pagination invariance (the
  * canonical Ogg duplicate), and the strict-grammar / hostile-input
  * discipline. */
class OggCodecSpec extends AnyFunSuite {

  test("re-paginated copies fingerprint identically; pages never " +
      "leak into content") {
    val a = OggCodec.encodeOgg(75L, 4, packetsPerPage = 2)
    val b = OggCodec.encodeOgg(75L, 4, packetsPerPage = 1,
      splitAcrossPages = true)
    val c = OggCodec.encodeOgg(75L, 4, packetsPerPage = 4)
    assert(!a.sameElements(b) && !b.sameElements(c))
    val da = OggCodec.decodeOggDigest(a).get
    val db = OggCodec.decodeOggDigest(b).get
    val dc = OggCodec.decodeOggDigest(c).get
    assert(da.channels === 1 && da.sampleRate === 8000)
    assert(da.packetDigests.length === 4)
    assert(da.packetDigests === db.packetDigests)
    assert(da.fingerprint === db.fingerprint)
    assert(da.fingerprint === dc.fingerprint)
    // different content / packet counts → different fingerprints
    assert(da.fingerprint !==
      OggCodec.decodeOggDigest(OggCodec.encodeOgg(76L, 4)).get
        .fingerprint)
    assert(da.fingerprint !==
      OggCodec.decodeOggDigest(OggCodec.encodeOgg(75L, 3)).get
        .fingerprint)
  }

  test("the digest matches the oracle formula") {
    val d = OggCodec.decodeOggDigest(OggCodec.encodeOgg(100L, 2)).get
    val head = "ogg:100:1:" + Mp4Codec.md5Hex("g100_1".getBytes("UTF-8"))
    val payload = head + "." * (300 - head.length)
    assert(d.packetDigests(1) ===
      Mp4Codec.md5Hex(payload.getBytes("US-ASCII")))
    assert(d.fingerprint === Mp4Codec.md5Hex(
      d.packetDigests.mkString("").getBytes("US-ASCII")))
  }

  test("packets longer than 255 reassemble through multi-lacing and " +
      "cross-page continuation") {
    // 700-byte packets force [255,255,190] lacing; the split form adds
    // a genuine cross-page 255-continuation
    val plain = OggCodec.encodeOgg(9L, 3, packetLen = 700)
    val split = OggCodec.encodeOgg(9L, 3, packetLen = 700,
      packetsPerPage = 1, splitAcrossPages = true)
    val dp = OggCodec.decodeOggDigest(plain).get
    val ds = OggCodec.decodeOggDigest(split).get
    assert(dp.fingerprint === ds.fingerprint)
    assert(dp.packetDigests.length === 3)
  }

  test("strict grammar: CRC damage, lost pages, truncation, and " +
      "trailing bytes reject") {
    val good = OggCodec.encodeOgg(5L, 3)
    assert(OggCodec.decodeOggDigest(good).isDefined)
    // flip one payload byte: the page CRC must catch it
    val mut = good.clone()
    mut(good.length - 10) = (mut(good.length - 10) ^ 0x40).toByte
    assert(OggCodec.decodeOggDigest(mut).isEmpty)
    // truncation at every byte (a cut stream always loses the EOS
    // page or breaks a CRC/extent)
    var n = 0
    while (n < good.length) {
      assert(OggCodec.decodeOggDigest(good.take(n)).isEmpty, s"@$n")
      n += 1
    }
    // trailing bytes after the EOS page
    assert(OggCodec.decodeOggDigest(good ++ "x".getBytes).isEmpty)
    // a lost page: splice out the middle page (find the 3rd OggS)
    def nthPage(k: Int): Int = {
      var at = -1
      var c = 0
      var i = 0
      while (i < good.length - 4 && at < 0) {
        if (good(i) == 'O' && good(i + 1) == 'g' && good(i + 2) == 'g' &&
            good(i + 3) == 'S') { c += 1; if (c == k) at = i }
        i += 1
      }
      at
    }
    val p3 = nthPage(3); val p4 = nthPage(4)
    assert(p3 > 0 && p4 > p3)
    assert(OggCodec.decodeOggDigest(
      good.take(p3) ++ good.drop(p4)).isEmpty)
    // bad version byte
    val bv = good.clone(); bv(4) = 1
    assert(OggCodec.decodeOggDigest(bv).isEmpty)
    // non-Vorbis first packet
    assert(OggCodec.decodeOggDigest("OggS junk".getBytes).isEmpty)
    assert(OggCodec.decodeOggDigest(Array.empty[Byte]).isEmpty)
    // seeded fuzz never throws
    val r = new scala.util.Random(0x55)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](r.nextInt(400) + 4)
      r.nextBytes(junk)
      junk(0) = 'O'; junk(1) = 'g'; junk(2) = 'g'; junk(3) = 'S'
      OggCodec.decodeOggDigest(junk)
    }
  }
}
