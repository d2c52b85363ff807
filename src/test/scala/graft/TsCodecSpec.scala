package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Mp4Codec, TsCodec}

/** The MPEG-TS digest tier: 188-byte packet tiling, PAT→PMT→PES
  * demux, PSI CRC-32/MPEG-2 verification, continuity-counter
  * discipline, Annex-B access-unit digests, and the headline
  * invariance — a TS↔MP4 re-mux of the same AVC access units
  * fingerprints identically across both containers. */
class TsCodecSpec extends AnyFunSuite {

  test("a TS segment digests the SAME fingerprint as its MP4 re-mux " +
      "(cross-container collapse, the packager shape)") {
    val mp4 = Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcMp4(23L, 4, 64, 64)).get
    val ts = TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(23L, 4)).get
    assert(ts.sampleDigests === mp4.sampleDigests)
    assert(ts.fingerprint === mp4.fingerprint)
    // the PMT's AVC video descriptor carries the avcC's profile/level
    assert(ts.profile === mp4.profile)
    assert(ts.level === mp4.level)
    // ... and the fragmented-MP4 form of the same units agrees too
    val frag = Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcFragmentedMp4(23L, 4, 64, 64)).get
    assert(ts.fingerprint === frag.fingerprint)
  }

  test("re-packetized twins fingerprint identically: repeated PSI, " +
      "null padding, unbounded PES, long start codes, repeated " +
      "parameter sets") {
    val base = TsCodec.encodeAvcTs(29L, 5)
    val d0 = TsCodec.decodeTsDigest(base).get
    val twins = Seq(
      TsCodec.encodeAvcTs(29L, 5, psiRepeat = true),
      TsCodec.encodeAvcTs(29L, 5, nullPadding = true),
      TsCodec.encodeAvcTs(29L, 5, pesLenZero = true),
      TsCodec.encodeAvcTs(29L, 5, longStartCodes = true),
      TsCodec.encodeAvcTs(29L, 5, psRepeat = true),
      TsCodec.encodeAvcTs(29L, 5, psiRepeat = true,
        nullPadding = true, pesLenZero = true, longStartCodes = true,
        psRepeat = true))
    twins.foreach { t =>
      assert(!t.sameElements(base))
      val dt = TsCodec.decodeTsDigest(t).get
      assert(dt.sampleDigests === d0.sampleDigests)
      assert(dt.fingerprint === d0.fingerprint)
    }
    // distinct scenes and distinct lengths stay distinct
    assert(TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(30L, 5)).get
      .fingerprint !== d0.fingerprint)
    assert(TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(29L, 4)).get
      .fingerprint !== d0.fingerprint)
  }

  test("a muxed-A/V segment (AAC sibling PID) collapses onto its " +
      "video-only twin — program components are not the digest") {
    val solo = TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(31L, 4)).get
    val muxed = TsCodec.encodeAvcTs(31L, 4, audioSibling = true)
    val dm = TsCodec.decodeTsDigest(muxed).get
    assert(dm.sampleDigests === solo.sampleDigests)
    assert(dm.fingerprint === solo.fingerprint)
    assert(dm.profile === solo.profile)
    // the sibling PID's continuity is still enforced: dropping a
    // MIDDLE audio packet (one seen before it, one after — removing
    // the FIRST would just re-anchor the PID's counter) drops whole
    val n = muxed.length / 188
    val audIdx = (0 until n).filter { i =>
      (((muxed(i * 188 + 1) & 0x1f) << 8) |
        (muxed(i * 188 + 2) & 0xff)) == 0x0101
    }
    assert(audIdx.length >= 3)
    val audAt = audIdx(1)
    val lost = muxed.take(188 * audAt) ++ muxed.drop(188 * (audAt + 1))
    assert(TsCodec.decodeTsDigest(lost).isEmpty)
  }

  test("an M2TS (192-byte BDAV) re-wrap collapses onto its plain-TS " +
      "and MP4 primaries; the 188/192 ambiguity resolves plain") {
    val plain = TsCodec.encodeAvcTs(43L, 4)
    val d0 = TsCodec.decodeTsDigest(plain).get
    val m2 = TsCodec.encodeAvcTs(43L, 4, m2ts = true)
    assert(m2.length === plain.length / 188 * 192)
    val dm = TsCodec.decodeTsDigest(m2).get
    assert(dm.sampleDigests === d0.sampleDigests)
    assert(dm.fingerprint === d0.fingerprint)
    assert(dm.fingerprint === Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcMp4(43L, 4, 64, 64)).get.fingerprint)
    // mid-packet cuts of the 192 form drop whole
    assert(TsCodec.decodeTsDigest(m2.take(m2.length - 30)).isEmpty)
    // the lcm ambiguity: a PLAIN stream padded with null packets to a
    // multiple of 48 packets is ALSO a multiple of 192 bytes — the
    // walk must keep the plain reading (sync at byte 0), not strip
    // phantom TP_extra_headers
    val nullPkt = Array[Byte](0x47, 0x1f, 0xff.toByte, 0x10) ++
      Array.fill[Byte](184)(0xff.toByte)
    val n = plain.length / 188
    val pad = (48 - n % 48) % 48
    val padded = plain ++ Array.fill(pad)(nullPkt).flatten
    assert(padded.length % 192 === 0 && padded.length % 188 === 0)
    assert(TsCodec.decodeTsDigest(padded)
      .exists(_.fingerprint == d0.fingerprint))
  }

  test("strict packet tiling: mid-packet cuts and non-188 lengths " +
      "drop whole; bounded-PES packet-boundary cuts drop too") {
    val full = TsCodec.encodeAvcTs(31L, 4)
    assert(full.length % 188 === 0)
    // a mid-packet cut (length no longer a multiple of 188)
    assert(TsCodec.decodeTsDigest(full.take(full.length - 30)).isEmpty)
    assert(TsCodec.decodeTsDigest(full.drop(10)).isEmpty)
    // a packet-boundary cut lands at an ACCESS-UNIT boundary here
    // (each planted PES fits one packet) — a legal shorter capture
    // that digests as DIFFERENT content (the WebM unknown-size
    // precedent), never a silent collapse
    val dFull = TsCodec.decodeTsDigest(full).get
    val cut = TsCodec.decodeTsDigest(full.take(full.length - 188))
    assert(cut.nonEmpty)
    assert(cut.get.sampleDigests === dFull.sampleDigests.init)
    assert(cut.get.fingerprint !== dFull.fingerprint)
    // a nonzero PES_packet_length is HONORED: bump the declared
    // length so it overruns the reassembled bytes — drop whole
    val m = full.clone()
    var at = -1
    var i = 188 * 2
    while (at < 0 && i < m.length - 5) {
      if (m(i) == 0 && m(i + 1) == 0 && m(i + 2) == 1 &&
          m(i + 3) == 0xe0.toByte) at = i + 5
      i += 1
    }
    assert(at > 0)
    m(at) = (m(at) + 1).toByte
    assert(TsCodec.decodeTsDigest(m).isEmpty)
    // the unbounded form (PES length 0) mid-packet cut still drops
    val unb = TsCodec.encodeAvcTs(31L, 4, pesLenZero = true)
    assert(TsCodec.decodeTsDigest(unb.take(unb.length - 30)).isEmpty)
  }

  test("continuity-counter discipline: a lost or duplicated packet " +
      "drops the file whole") {
    val full = TsCodec.encodeAvcTs(37L, 5)
    val n = full.length / 188
    // remove a middle packet: the receiving PID sees a CC gap
    val lost = full.take(188 * (n / 2)) ++ full.drop(188 * (n / 2 + 1))
    assert(lost.length % 188 === 0)
    assert(TsCodec.decodeTsDigest(lost).isEmpty)
    // duplicate a middle packet: CC repeats on a payload packet
    val mid = full.slice(188 * (n / 2), 188 * (n / 2 + 1))
    val dup = full.take(188 * (n / 2 + 1)) ++ mid ++
      full.drop(188 * (n / 2 + 1))
    assert(TsCodec.decodeTsDigest(dup).isEmpty)
  }

  test("PSI sections are CRC-verified: a flipped byte under the " +
      "checksum drops instead of mis-routing the demux") {
    val full = TsCodec.encodeAvcTs(41L, 4)
    assert(TsCodec.decodeTsDigest(full).nonEmpty)
    // the PMT is packet 1; its section body starts at 188+4+1 (hdr +
    // pointer). Flip a byte inside the ES loop (stream_type region).
    val m = full.clone()
    m(188 + 20) = (m(188 + 20) ^ 0x01).toByte
    assert(TsCodec.decodeTsDigest(m).isEmpty)
    // same flip in the PAT (packet 0)
    val m2 = full.clone()
    m2(10) = (m2(10) ^ 0x01).toByte
    assert(TsCodec.decodeTsDigest(m2).isEmpty)
    // transport_error_indicator set drops
    val m3 = full.clone()
    m3(188 * 2 + 1) = (m3(188 * 2 + 1) | 0x80).toByte
    assert(TsCodec.decodeTsDigest(m3).isEmpty)
    // scrambling bits set drop
    val m4 = full.clone()
    m4(188 * 2 + 3) = (m4(188 * 2 + 3) | 0x80).toByte
    assert(TsCodec.decodeTsDigest(m4).isEmpty)
    // a corrupted NAL header (forbidden bit) under the ES drops:
    // find the first IDR header byte (0x65 after a start code)
    val es = full.clone()
    var i = 188 * 2
    var hit = -1
    while (hit < 0 && i < es.length - 4) {
      if (es(i) == 0 && es(i + 1) == 0 && es(i + 2) == 1 &&
          es(i + 3) == 0x65) hit = i + 3
      i += 1
    }
    assert(hit > 0)
    es(hit) = (es(hit) | 0x80).toByte
    assert(TsCodec.decodeTsDigest(es).isEmpty)
  }

  test("non-TS payloads and foreign bytes reject at the gate") {
    assert(TsCodec.decodeTsDigest(Array.emptyByteArray).isEmpty)
    assert(TsCodec.decodeTsDigest(Array.fill[Byte](188)(0x42)).isEmpty)
    assert(TsCodec.decodeTsDigest(
      Mp4Codec.encodeAvcMp4(23L, 4, 64, 64)).isEmpty)
    // 188 bytes of a valid-sync packet but no PAT/PMT/PES → no
    // samples → drop
    val hdrOnly = Array[Byte](0x47, 0x1f, 0xff.toByte, 0x10) ++
      Array.fill[Byte](184)(0xff.toByte)
    assert(TsCodec.decodeTsDigest(hdrOnly).isEmpty)
  }

  test("HEVC segments (stream_type 0x24) digest their own family " +
      "with the 2-byte NAL grammar and descriptor metadata") {
    val h = TsCodec.decodeTsDigest(
      TsCodec.encodeAvcTs(29L, 5, hevc = true)).get
    assert(h.codec === "hevc")
    assert(h.profile === 1)   // Main, from the HEVC descriptor
    assert(h.level === 93)
    assert(h.sampleDigests.length === 5)
    // the digest matches the oracle formula: VPS/SPS/PPS/AUD are
    // excluded; AU 0 carries the SEI-prefix NAL + the IDR
    def md5s(s: String) = Mp4Codec.md5Hex(s.getBytes("US-ASCII"))
    assert(h.sampleDigests.head ===
      md5s("hsei:29" + "hev:29:0:" + md5s("h29_0")))
    assert(h.sampleDigests(1) === md5s("hev:29:1:" + md5s("h29_1")))
    // the re-packetized HEVC twin collapses within its family
    val tw = TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(29L, 5,
      hevc = true, psiRepeat = true, nullPadding = true,
      pesLenZero = true, longStartCodes = true, psRepeat = true)).get
    assert(tw.fingerprint === h.fingerprint)
    // ... and never onto the AVC family of the same scene
    assert(h.fingerprint !==
      TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(29L, 5)).get
        .fingerprint)
    // a corrupted HEVC NAL header (forbidden bit) drops whole
    val full = TsCodec.encodeAvcTs(29L, 5, hevc = true)
    var hit = -1
    var i = 188 * 2
    while (hit < 0 && i < full.length - 4) {
      if (full(i) == 0 && full(i + 1) == 0 && full(i + 2) == 1 &&
          full(i + 3) == (19 << 1).toByte) hit = i + 3
      i += 1
    }
    assert(hit > 0)
    val m = full.clone()
    m(hit) = (m(hit) | 0x80).toByte
    assert(TsCodec.decodeTsDigest(m).isEmpty)
  }

  test("the digest matches the oracle formula") {
    // sample k digests md5 of ('sei:{scene}' when k=0) ++
    // 'avc:{scene}:{k}:' ++ md5('n{scene}_{k}') — the SAME formula
    // the mm_clip_exact oracle recomputes; AUD/SPS/PPS are excluded
    val d = TsCodec.decodeTsDigest(TsCodec.encodeAvcTs(200L, 3)).get
    def md5s(s: String) = Mp4Codec.md5Hex(s.getBytes("US-ASCII"))
    val want = (0 until 3).map { k =>
      val idr = s"avc:200:$k:" + md5s(s"n200_$k")
      if (k == 0) md5s(s"sei:200" + idr) else md5s(idr)
    }
    assert(d.sampleDigests === want.toVector)
  }
}
