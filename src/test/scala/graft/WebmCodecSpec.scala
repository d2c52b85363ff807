package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Mp4Codec, WebmCodec}

/** The WebM/Matroska digest tier: EBML vint grammar, DocType gate,
  * Tracks metadata, Cluster/SimpleBlock/BlockGroup walk, re-mux
  * (re-cluster + re-group) fingerprint invariance, and the strict
  * hostile-input discipline. */
class WebmCodecSpec extends AnyFunSuite {

  test("re-clustered and re-grouped copies fingerprint identically; " +
      "container layout never leaks into content") {
    val a = WebmCodec.encodeWebm(75L, 4, framesPerCluster = 2)
    val b = WebmCodec.encodeWebm(75L, 4, framesPerCluster = 1,
      useBlockGroups = true)
    val c = WebmCodec.encodeWebm(75L, 4, framesPerCluster = 4)
    assert(!a.sameElements(b) && !b.sameElements(c))
    val da = WebmCodec.decodeWebmDigest(a).get
    val db = WebmCodec.decodeWebmDigest(b).get
    val dc = WebmCodec.decodeWebmDigest(c).get
    assert(da.trackType === 1)
    assert(da.codecId === "V_VP8")
    assert(da.width === 64 && da.height === 64)
    assert(da.frameDigests.length === 4)
    assert(da.frameDigests === db.frameDigests)
    assert(da.fingerprint === db.fingerprint)
    assert(da.fingerprint === dc.fingerprint)
    // different content / frame counts → different fingerprints
    assert(da.fingerprint !==
      WebmCodec.decodeWebmDigest(WebmCodec.encodeWebm(76L, 4)).get
        .fingerprint)
    assert(da.fingerprint !==
      WebmCodec.decodeWebmDigest(WebmCodec.encodeWebm(75L, 3)).get
        .fingerprint)
  }

  test("all three lacing forms reassemble the same frames as the " +
      "unlaced layout") {
    val plain = WebmCodec.encodeWebm(42L, 5)
    val dp = WebmCodec.decodeWebmDigest(plain).get
    for (lac <- Seq(1, 2, 3)) {
      val laced = WebmCodec.encodeWebm(42L, 5, framesPerCluster = 3,
        lacing = lac)
      assert(!plain.sameElements(laced))
      val dl = WebmCodec.decodeWebmDigest(laced).get
      assert(dl.frameDigests === dp.frameDigests, s"lacing=$lac")
      assert(dl.fingerprint === dp.fingerprint, s"lacing=$lac")
    }
    // varying frame lengths: multi-byte Xiph size runs (300 = 255+45)
    // and NONZERO signed EBML deltas
    for (lac <- Seq(1, 3)) {
      val a = WebmCodec.encodeWebm(9L, 5, framesPerCluster = 5,
        lacing = lac, frameLen = 300, lenStep = 31)
      val b = WebmCodec.encodeWebm(9L, 5, framesPerCluster = 1,
        frameLen = 300, lenStep = 31)
      val da = WebmCodec.decodeWebmDigest(a).get
      val db = WebmCodec.decodeWebmDigest(b).get
      assert(da.frameDigests.length === 5)
      assert(da.frameDigests === db.frameDigests, s"lacing=$lac")
    }
    // shrinking lengths: negative EBML deltas
    val neg = WebmCodec.encodeWebm(9L, 4, framesPerCluster = 4,
      lacing = 3, frameLen = 400, lenStep = -40)
    val negRef = WebmCodec.encodeWebm(9L, 4, framesPerCluster = 1,
      frameLen = 400, lenStep = -40)
    assert(WebmCodec.decodeWebmDigest(neg).get.frameDigests ===
      WebmCodec.decodeWebmDigest(negRef).get.frameDigests)
    // single-frame laced blocks carry no size table
    for (lac <- Seq(1, 2, 3)) {
      val one = WebmCodec.encodeWebm(7L, 3, framesPerCluster = 1,
        lacing = lac)
      assert(WebmCodec.decodeWebmDigest(one).get.fingerprint ===
        WebmCodec.decodeWebmDigest(WebmCodec.encodeWebm(7L, 3)).get
          .fingerprint, s"lacing=$lac")
    }
  }

  test("audio-only tracks select through the same tier, and an " +
      "interleaved audio sibling never leaks into a video digest") {
    val weba = WebmCodec.encodeWebm(33L, 3, audioTrack = true)
    val da = WebmCodec.decodeWebmDigest(weba).get
    assert(da.trackType === 2)
    assert(da.codecId === "A_OPUS")
    assert(da.channels === 2 && da.width === 0 && da.height === 0)
    assert(da.frameDigests.length === 3)
    // the disjoint key space: audio and video files of one scene
    // never share a fingerprint
    val video = WebmCodec.encodeWebm(33L, 3)
    val dv = WebmCodec.decodeWebmDigest(video).get
    assert(da.fingerprint !== dv.fingerprint)
    // a re-laced audio copy collapses
    val relaced = WebmCodec.encodeWebm(33L, 3, framesPerCluster = 3,
      lacing = 1, audioTrack = true)
    assert(WebmCodec.decodeWebmDigest(relaced).get.fingerprint ===
      da.fingerprint)
    // the audio-sibling re-mux: same video frames + an interleaved
    // A_OPUS track — the track filter must ignore the foreign blocks
    val sib = WebmCodec.encodeWebm(33L, 3, audioSibling = true)
    assert(!video.sameElements(sib))
    val ds = WebmCodec.decodeWebmDigest(sib).get
    assert(ds.codecId === "V_VP8")
    assert(ds.frameDigests === dv.frameDigests)
    assert(ds.fingerprint === dv.fingerprint)
  }

  test("the digest matches the oracle formula") {
    val d = WebmCodec.decodeWebmDigest(WebmCodec.encodeWebm(100L, 2)).get
    val head = "webm:100:1:" + Mp4Codec.md5Hex("w100_1".getBytes("UTF-8"))
    assert(d.frameDigests(1) === Mp4Codec.md5Hex(
      (head + "." * (180 - head.length)).getBytes("US-ASCII")))
    assert(d.fingerprint === Mp4Codec.md5Hex(
      d.frameDigests.mkString("").getBytes("US-ASCII")))
  }

  test("strict grammar: DocType gate, truncation, trailing bytes, " +
      "lacing, and unknown-size elements reject") {
    val good = WebmCodec.encodeWebm(5L, 3)
    assert(WebmCodec.decodeWebmDigest(good).isDefined)
    // truncation at EVERY byte: the segment size must reach exactly
    // end-of-file, so any cut fails whole
    var n = 0
    while (n < good.length) {
      assert(WebmCodec.decodeWebmDigest(good.take(n)).isEmpty, s"@$n")
      n += 1
    }
    // trailing bytes after the segment
    assert(WebmCodec.decodeWebmDigest(good ++ "x".getBytes).isEmpty)
    // a foreign DocType
    val dtAt = good.indexOfSlice("webm".getBytes("US-ASCII"))
    val badDt = good.clone(); badDt(dtAt) = 'x'
    assert(WebmCodec.decodeWebmDigest(badDt).isEmpty)
    // lacing bits flipped on over an unlaced body: the bogus size
    // table cannot tile the block — malformed lacing rejects whole.
    // SimpleBlock: id(1) size(vint) track(1) tc(2) flags(1)
    // (search past byte 3: the EBML magic 1A45DFA3 ends in 0xA3)
    val sbAt = good.indexOfSlice(Array[Byte](0xA3.toByte), 4)
    assert(sbAt > 0)
    val sbSzLen =
      java.lang.Integer.numberOfLeadingZeros(good(sbAt + 1) & 0xff) - 23
    val laced = good.clone()
    val flagsAt = sbAt + 1 + sbSzLen + 3
    laced(flagsAt) = (laced(flagsAt) | 0x06).toByte
    assert(WebmCodec.decodeWebmDigest(laced).isEmpty)
    // an unknown-size segment (all-ones size vint) rejects
    val segAt = good.indexOfSlice(
      Array[Byte](0x18, 0x53.toByte, 0x80.toByte, 0x67))
    val segSizeLen =
      java.lang.Integer.numberOfLeadingZeros(good(segAt + 4) & 0xff) - 23
    assert(segSizeLen === 2, "fixture segment size is a 2-byte vint")
    val unk = good.clone()
    unk(segAt + 4) = 0x7f.toByte; unk(segAt + 5) = 0xff.toByte
    assert(WebmCodec.decodeWebmDigest(unk).isEmpty)
    // a webm with only a metadata-free track list is not a clip
    assert(WebmCodec.decodeWebmDigest("not ebml".getBytes).isEmpty)
    assert(WebmCodec.decodeWebmDigest(Array.empty[Byte]).isEmpty)
    // seeded fuzz behind the EBML magic never throws
    val r = new scala.util.Random(0x77)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](r.nextInt(400) + 8)
      r.nextBytes(junk)
      junk(0) = 0x1A; junk(1) = 0x45; junk(2) = 0xDF.toByte
      junk(3) = 0xA3.toByte
      WebmCodec.decodeWebmDigest(junk)
    }
  }
}
