package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AacCodec, Mp4Codec, Multimodal, PixelCodec}
import graft.multimodal.PixelCodec.Gray

/** The MJPEG-in-MP4 tier: box-tree walk to the video track, sample-
  * table reconstruction (stsz/stco/stsc incl. multi-chunk runs),
  * per-sample JPEG decode, pixel identity with the GIF rendering of
  * the same frames, and the hostile-input discipline. */
class Mp4CodecSpec extends AnyFunSuite {

  private def frames(scene: Long, f: Int): Seq[Gray] =
    graft.queries.MultimodalFrameOps.frameGrids(scene, f)

  test("sample tables round-trip: every frame decodes bit-exactly") {
    for (f <- Seq(1, 2, 3, 5, 6); chunk <- Seq(1, 2, 4)) {
      val fs = frames(42L + f, f)
      val mp4 = Mp4Codec.encodeMjpegMp4(fs, chunkSize = chunk)
      val d = Mp4Codec.decodeMjpegFrames(mp4)
      assert(d.isDefined, s"f=$f chunk=$chunk")
      assert(d.get.length === f)
      for (i <- 0 until f)
        assert(d.get(i).luma.toSeq === fs(i).luma.toSeq,
          s"f=$f chunk=$chunk frame=$i")
    }
    // color samples (3-component JPEGs) land the same luma
    val fs = frames(7L, 4)
    val d = Mp4Codec.decodeMjpegFrames(
      Mp4Codec.encodeMjpegMp4(fs, color = true))
    assert(d.isDefined)
    for (i <- 0 until 4)
      assert(d.get(i).luma.toSeq === fs(i).luma.toSeq)
  }

  test("MP4 and GIF renderings of one clip hash frame-identical through the seam") {
    import graft.multimodal.GifCodec
    val fs = frames(99L, 4)
    val mp4 = Multimodal.decodeClipFrames(Mp4Codec.encodeMjpegMp4(fs)).get
    val gif = Multimodal.decodeClipFrames(
      GifCodec.encodeGifAnimated(fs, salt = 3)).get
    assert(mp4.length === gif.length)
    for (i <- fs.indices) {
      val hm = PixelCodec.dhash64(PixelCodec.lumaGrid8(mp4(i)).get)
      val hg = PixelCodec.dhash64(PixelCodec.lumaGrid8(gif(i)).get)
      assert(hm === hg, s"frame $i")
    }
  }

  test("AVC digest tier: re-muxed twins fingerprint identically, " +
      "framing changes never leak into the digest") {
    val a = Mp4Codec.encodeAvcMp4(75L, 4, 64, 64, chunkSize = 2,
      lengthSize = 4)
    val b = Mp4Codec.encodeAvcMp4(75L, 4, 64, 64, chunkSize = 3,
      lengthSize = 2)
    val c = Mp4Codec.encodeAvcMp4(75L, 4, 64, 64, chunkSize = 1,
      lengthSize = 1)
    assert(!a.sameElements(b) && !b.sameElements(c)) // byte-distinct
    val da = Mp4Codec.decodeAvcDigest(a).get
    val db = Mp4Codec.decodeAvcDigest(b).get
    val dc = Mp4Codec.decodeAvcDigest(c).get
    assert(da.width === 64 && da.height === 64)
    assert(da.profile === 66 && da.level === 30)
    assert(da.sampleDigests.length === 4)
    assert(da.sampleDigests === db.sampleDigests)
    assert(da.fingerprint === db.fingerprint)
    assert(da.fingerprint === dc.fingerprint)
    // different content → different fingerprint
    val other = Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcMp4(76L, 4, 64, 64)).get
    assert(other.fingerprint !== da.fingerprint)
    val shorter = Mp4Codec.decodeAvcDigest(
      Mp4Codec.encodeAvcMp4(75L, 3, 64, 64)).get
    assert(shorter.fingerprint !== da.fingerprint)
    // the digest matches the oracle formula: md5 over NAL payloads
    // (frame 0: sei + idr; later frames: idr alone)
    val k1Payload = "avc:75:1:" +
      Mp4Codec.md5Hex("n75_1".getBytes("UTF-8"))
    assert(da.sampleDigests(1) ===
      Mp4Codec.md5Hex(k1Payload.getBytes("US-ASCII")))
    val k0Payload = "sei:75" + "avc:75:0:" +
      Mp4Codec.md5Hex("n75_0".getBytes("UTF-8"))
    assert(da.sampleDigests(0) ===
      Mp4Codec.md5Hex(k0Payload.getBytes("US-ASCII")))
  }

  test("AVC digest tier: re-fragmented (moof/traf/trun), co64, and " +
      "largesize forms all fingerprint onto the flat primary") {
    val flat = Mp4Codec.encodeAvcMp4(80L, 5, 64, 64, chunkSize = 2,
      lengthSize = 4)
    val frag = Mp4Codec.encodeAvcFragmentedMp4(80L, 5, 64, 64,
      samplesPerFrag = 2)
    val frag1 = Mp4Codec.encodeAvcFragmentedMp4(80L, 5, 64, 64,
      samplesPerFrag = 1, largesizeMdat = true)
    val co64 = Mp4Codec.encodeAvcMp4(80L, 5, 64, 64, chunkSize = 3,
      lengthSize = 2, useCo64 = true)
    val all = Seq(flat, frag, frag1, co64)
    for (i <- all.indices; j <- all.indices if i < j)
      assert(!all(i).sameElements(all(j)), s"$i/$j byte-identical")
    val ds = all.map(x => Mp4Codec.decodeAvcDigest(x).get)
    assert(ds.forall(_.fingerprint == ds.head.fingerprint))
    assert(ds.forall(_.sampleDigests == ds.head.sampleDigests))
    assert(ds(1).width === 64 && ds(1).profile === 66)
    assert(ds(1).sampleDigests.length === 5)
  }

  test("trex-provided default sample sizes resolve (the DASH " +
      "init-segment layout); sizes nowhere still drop the clip") {
    val flat = Mp4Codec.encodeAvcMp4(80L, 5, 64, 64)
    val trex = Mp4Codec.encodeAvcFragmentedMp4(80L, 5, 64, 64,
      samplesPerFrag = 2, trexSizeDefaults = true)
    val plain = Mp4Codec.encodeAvcFragmentedMp4(80L, 5, 64, 64,
      samplesPerFrag = 2)
    assert(!trex.sameElements(plain))
    // the trex form genuinely omits per-sample sizes: fragments past
    // the first carry the 0x000001 (data-offset-only) trun flags
    var sizeless = 0
    var at = trex.indexOfSlice("trun".getBytes("US-ASCII"))
    while (at >= 0) {
      if (trex(at + 6) == 0 && trex(at + 7) == 0x01) sizeless += 1
      at = trex.indexOfSlice("trun".getBytes("US-ASCII"), at + 1)
    }
    assert(sizeless >= 2, "no sizeless truns — the knob did nothing")
    val dt = Mp4Codec.decodeAvcDigest(trex).get
    val df = Mp4Codec.decodeAvcDigest(flat).get
    assert(dt.sampleDigests === df.sampleDigests)
    assert(dt.fingerprint === df.fingerprint)
    // zeroing the trex default leaves the sizeless truns with sizes
    // NOWHERE → the whole clip drops
    val trexAt = trex.indexOfSlice("trex".getBytes("US-ASCII"))
    val noSz = trex.clone()
    for (i <- 0 until 4) noSz(trexAt + 20 + i) = 0
    assert(Mp4Codec.decodeAvcDigest(noSz).isEmpty)
    // a tfhd default-sample-size OVERRIDES trex: leave trex at a
    // WRONG size and verify the file drops (the bent size breaks the
    // NAL tiling), then that precedence is what saves a correct tfhd
    val bentTrex = trex.clone()
    bentTrex(trexAt + 23) = (bentTrex(trexAt + 23) + 1).toByte
    assert(Mp4Codec.decodeAvcDigest(bentTrex).isEmpty)
    // truncation at every byte still rejects except mdat boundaries
    for (n <- 1 until trex.length if n % 97 == 0)
      Mp4Codec.decodeAvcDigest(trex.take(n)) // never throws
    // multi-trun trafs: the second trun carries NO data offset and
    // continues contiguously from the first — the running-offset
    // continuation path, alone and combined with trex defaults
    val split = Mp4Codec.encodeAvcFragmentedMp4(80L, 5, 64, 64,
      samplesPerFrag = 2, splitTruns = true)
    assert(!split.sameElements(plain))
    assert(Mp4Codec.decodeAvcDigest(split).get.fingerprint ===
      df.fingerprint)
    val splitTrex = Mp4Codec.encodeAvcFragmentedMp4(80L, 5, 64, 64,
      samplesPerFrag = 2, splitTruns = true, trexSizeDefaults = true)
    assert(Mp4Codec.decodeAvcDigest(splitTrex).get.fingerprint ===
      df.fingerprint)
  }

  test("fragment-walk strictness: truncation, unanchored tfhd/trun, " +
      "and foreign-track trafs") {
    val frag = Mp4Codec.encodeAvcFragmentedMp4(44L, 4, 64, 64,
      samplesPerFrag = 2)
    val full = Mp4Codec.decodeAvcDigest(frag).get
    assert(full.sampleDigests.length === 4)
    // fragment boundaries: end of moov (0 samples → None) and the end
    // of each moof+mdat pair (a structurally complete shorter file —
    // the MP3 frame-boundary / WARC record-boundary precedent);
    // every other cut must be None
    def boxEnds(): Seq[(Int, String)] = {
      val out = Seq.newBuilder[(Int, String)]
      var p = 0
      while (p + 8 <= frag.length) {
        val sz =
          if (frag(p) == 0 && frag(p + 1) == 0 && frag(p + 2) == 0 &&
              frag(p + 3) == 1)
            ((frag(p + 12) & 0xffL) << 24 | (frag(p + 13) & 0xffL) << 16 |
             (frag(p + 14) & 0xffL) << 8 | (frag(p + 15) & 0xffL)).toInt
          else
            ((frag(p) & 0xff) << 24 | (frag(p + 1) & 0xff) << 16 |
             (frag(p + 2) & 0xff) << 8 | (frag(p + 3) & 0xff))
        val typ = new String(frag, p + 4, 4, "US-ASCII")
        out += ((p + sz, typ))
        p += sz
      }
      out.result()
    }
    val mdatEnds = boxEnds().filter(_._2 == "mdat").map(_._1).toSet
    var n = 0
    while (n < frag.length) {
      val r = Mp4Codec.decodeAvcDigest(frag.take(n))
      if (mdatEnds.contains(n)) {
        // 2 samples per fragment: k complete fragments survive
        assert(r.exists(_.sampleDigests.length % 2 == 0), s"@$n")
        assert(r.get.sampleDigests ===
          full.sampleDigests.take(r.get.sampleDigests.length), s"@$n")
      } else assert(r.isEmpty, s"@$n")
      n += 1
    }
    // clearing the tfhd default-base-is-moof flag leaves no anchor
    val tfhdAt = frag.indexOfSlice("tfhd".getBytes("US-ASCII"))
    assert(Mp4Codec.decodeAvcDigest(
      frag.updated(tfhdAt + 5, 0.toByte)).isEmpty)
    // clearing the trun data-offset flag leaves the leading trun
    // unanchored
    val trunAt = frag.indexOfSlice("trun".getBytes("US-ASCII"))
    assert(Mp4Codec.decodeAvcDigest(
      frag.updated(trunAt + 7, 0x00.toByte)).isEmpty)
    // retargeting ONE traf to a foreign track id skips that fragment
    // (real fMP4 interleaves per-track moofs — an audio moof is not an
    // error for the video walk) but keeps the others…
    val oneForeign = Mp4Codec.decodeAvcDigest(
      frag.updated(tfhdAt + 11, 9.toByte))
    assert(oneForeign.exists(_.sampleDigests ==
      full.sampleDigests.drop(2)))
    // …while a file whose every traf is foreign has no video samples
    val allForeign = frag.clone()
    var fAt = frag.indexOfSlice("tfhd".getBytes("US-ASCII"))
    while (fAt >= 0) {
      allForeign(fAt + 11) = 9.toByte
      fAt = frag.indexOfSlice("tfhd".getBytes("US-ASCII"), fAt + 1)
    }
    assert(Mp4Codec.decodeAvcDigest(allForeign).isEmpty)
    // a nudged data offset breaks the NAL tiling → whole-clip None
    val bent = frag.clone()
    bent(trunAt + 15) = (bent(trunAt + 15) + 1).toByte
    assert(Mp4Codec.decodeAvcDigest(bent).isEmpty)
  }

  test("AAC digest tier: m4a re-mux and ADTS re-wrap fingerprint " +
      "onto the m4a primary; strictness holds") {
    val m4a = AacCodec.encodeAacM4a(60L, 4, chunkSize = 2)
    val remux = AacCodec.encodeAacM4a(60L, 4, chunkSize = 3,
      useCo64 = true)
    val adts = AacCodec.encodeAacAdts(60L, 4)
    assert(!m4a.sameElements(remux))
    val dm = AacCodec.decodeM4aDigest(m4a).get
    val dr = AacCodec.decodeM4aDigest(remux).get
    val da = AacCodec.decodeAdtsDigest(adts).get
    assert(dm.channels === 2 && dm.sampleRate === 44100)
    assert(da.channels === 2 && da.sampleRate === 44100)
    assert(dm.sampleDigests.length === 4)
    assert(dm.sampleDigests === dr.sampleDigests)
    assert(dm.sampleDigests === da.sampleDigests)
    assert(dm.fingerprint === da.fingerprint)
    // the oracle formula
    val head = "aac:60:1:" + Mp4Codec.md5Hex("c60_1".getBytes("UTF-8"))
    assert(dm.sampleDigests(1) === Mp4Codec.md5Hex(
      (head + "." * (200 - head.length)).getBytes("US-ASCII")))
    // different content → different fingerprint
    assert(AacCodec.decodeM4aDigest(
      AacCodec.encodeAacM4a(61L, 4)).get.fingerprint !== dm.fingerprint)
    // contract boundaries: the AAC walk rejects video containers and
    // vice versa
    assert(AacCodec.decodeM4aDigest(
      Mp4Codec.encodeAvcMp4(60L, 3, 64, 64)).isEmpty)
    assert(Mp4Codec.decodeAvcDigest(m4a).isEmpty)
    assert(AacCodec.decodeAdtsDigest(m4a).isEmpty)
    // m4a truncation at every byte (moov last) → None
    for (n <- 0 until m4a.length)
      assert(AacCodec.decodeM4aDigest(m4a.take(n)).isEmpty, s"@$n")
    // ADTS: frame-boundary cuts are legal shorter streams; all other
    // cuts reject (the MP3 tiling discipline)
    val flen = adts.length / 4
    var n = 0
    while (n < adts.length) {
      val r = AacCodec.decodeAdtsDigest(adts.take(n))
      if (n > 0 && n % flen == 0)
        assert(r.exists(_.sampleDigests.length == n / flen), s"@$n")
      else assert(r.isEmpty, s"@$n")
      n += 1
    }
    // trailing slack and a corrupted esds objectTypeIndication reject
    assert(AacCodec.decodeAdtsDigest(adts ++ "x".getBytes).isEmpty)
    val esdsAt = m4a.indexOfSlice("esds".getBytes("US-ASCII"))
    // ver/flags(4) then ES tag(1) size(1) ES_ID(2) flags(1) then
    // DecoderConfig tag(1) size(1) objectTypeIndication
    val otiAt = esdsAt + 4 + 4 + 2 + 2 + 1 + 2
    assert((m4a(otiAt) & 0xff) === 0x40)
    assert(AacCodec.decodeM4aDigest(
      m4a.updated(otiAt, 0x21.toByte)).isEmpty)
    // a multi-RDB ADTS frame is outside the envelope
    val rdb = adts.clone(); rdb(6) = (rdb(6) | 1).toByte
    assert(AacCodec.decodeAdtsDigest(rdb).isEmpty)
    // ID3-tagged ADTS (the re-tag duplicate shape): ID3v2 + ID3v1
    // wrap the identical frames — byte-distinct, same fingerprint
    val tagged = AacCodec.encodeAacAdts(60L, 4, id3v2 = true,
      id3v1 = true)
    assert(!tagged.sameElements(adts))
    val dtag = AacCodec.decodeAdtsDigest(tagged).get
    assert(dtag.sampleDigests === da.sampleDigests)
    assert(dtag.fingerprint === dm.fingerprint)
    // the trailer sniff must not override a valid tiling: plant 'TAG'
    // 128 bytes from EOF inside the last frame's dot padding — the
    // untrimmed walk still tiles, so all 4 frames survive
    val planted = adts.clone()
    val tagAt = planted.length - 128
    planted(tagAt) = 'T'.toByte; planted(tagAt + 1) = 'A'.toByte
    planted(tagAt + 2) = 'G'.toByte
    assert(AacCodec.decodeAdtsDigest(planted)
      .exists(_.sampleDigests.length == 4))
    // a corrupted ID3v1 trailer magic leaves slack → None
    val badTag = tagged.clone()
    badTag(badTag.length - 128) = 'X'.toByte
    assert(AacCodec.decodeAdtsDigest(badTag).isEmpty)
    // a tagged stream truncated mid-frame drops whole
    assert(AacCodec.decodeAdtsDigest(
      tagged.take(tagged.length - 150)).isEmpty)
    // a non-syncsafe ID3v2 size byte rejects
    val badV2 = tagged.clone(); badV2(6) = 0x80.toByte
    assert(AacCodec.decodeAdtsDigest(badV2).isEmpty)
    // the CRC form (protection_absent=0, 9-byte headers): the 2 CRC
    // bytes are framing the digest skips — byte-distinct, the same
    // fingerprint as the no-CRC and m4a forms
    val crcForm = AacCodec.encodeAacAdts(60L, 4, crc = true)
    assert(!crcForm.sameElements(adts))
    assert(crcForm.length === adts.length + 2 * 4)
    val dcrc = AacCodec.decodeAdtsDigest(crcForm).get
    assert(dcrc.sampleDigests === da.sampleDigests)
    assert(dcrc.fingerprint === dm.fingerprint)
    // the MPEG-2-ID variant (ID bit set, same layout): collapses too
    val m2 = AacCodec.encodeAacAdts(60L, 4, mpeg2Id = true)
    assert(!m2.sameElements(adts))
    assert(AacCodec.decodeAdtsDigest(m2).get.fingerprint ===
      dm.fingerprint)
    // a CRC-form frame whose length field forgets the CRC bytes
    // breaks the tiling → None
    val shortLen = AacCodec.encodeAacAdts(60L, 1, crc = true)
    val goodLen = ((shortLen(3) & 3) << 11) |
      ((shortLen(4) & 0xff) << 3) | ((shortLen(5) >> 5) & 7)
    assert(goodLen === shortLen.length)
    val bent = shortLen.clone()
    bent(4) = ((goodLen - 2) >> 3).toByte
    bent(5) = (((goodLen - 2) & 7) << 5 | 0x1f).toByte
    assert(AacCodec.decodeAdtsDigest(bent).isEmpty)
    // the audio cap is the AUDIO-scale 65536, not the 256-frame video
    // cap: a real-length stream (>256 units) must collapse across
    // containers too
    val long4a = AacCodec.encodeAacM4a(9L, 300)
    val longAdts = AacCodec.encodeAacAdts(9L, 300)
    val dl = AacCodec.decodeM4aDigest(long4a)
    assert(dl.exists(_.sampleDigests.length == 300))
    assert(dl.get.fingerprint ===
      AacCodec.decodeAdtsDigest(longAdts).get.fingerprint)
  }

  test("AVC digest tier: the contract boundary holds both ways") {
    val avc = Mp4Codec.encodeAvcMp4(100L, 3, 64, 64)
    // no pixel decode is attempted on AVC tracks
    assert(Mp4Codec.decodeMjpegFrames(avc).isEmpty)
    assert(Multimodal.decodeClipFrames(avc).isEmpty)
    // and the digest tier rejects MJPEG tracks (they have the pixel
    // path) and malformed AVC structure
    val mjpeg = Mp4Codec.encodeMjpegMp4(frames(5L, 3))
    assert(Mp4Codec.decodeAvcDigest(mjpeg).isEmpty)
    // truncation at every byte → None, never a partial digest
    for (n <- 0 until avc.length by 1)
      assert(Mp4Codec.decodeAvcDigest(avc.take(n)).isEmpty, s"take($n)")
    // corrupt the first NAL header (right after the 4-byte length
    // prefix at payload start): forbidden bit + invalid type
    val mdatAt = avc.indexOfSlice("mdat".getBytes("US-ASCII"))
    val mut = avc.updated(mdatAt + 8, 0x80.toByte)
    assert(Mp4Codec.decodeAvcDigest(mut).isEmpty)
    // corrupt the avcC version byte
    val avcCAt = avc.indexOfSlice("avcC".getBytes("US-ASCII"))
    val mut2 = avc.updated(avcCAt + 4, 9.toByte)
    assert(Mp4Codec.decodeAvcDigest(mut2).isEmpty)
    // seeded fuzz: never throws
    val rnd = new scala.util.Random(778)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(300) + 16)
      rnd.nextBytes(junk)
      junk(4) = 'm'; junk(5) = 'o'; junk(6) = 'o'; junk(7) = 'v'
      Mp4Codec.decodeAvcDigest(junk)
    }
  }

  test("hostile inputs never throw and decode to None") {
    val good = Mp4Codec.encodeMjpegMp4(frames(5L, 3))
    assert(Mp4Codec.decodeMjpegFrames(good).isDefined)
    // truncation at every byte: mdat precedes moov, so any cut loses
    // the sample tables or a sample extent
    for (n <- 0 until good.length by 1)
      assert(Mp4Codec.decodeMjpegFrames(good.take(n)).isEmpty, s"take($n)")
    // the header-only mvhd fixture (AvHeaderDecoder's shape): no trak
    assert(Mp4Codec.decodeMjpegFrames(
      Multimodal.MediaHeaders.mp4(600, 1200)).isEmpty)
    // a corrupted sample byte makes its JPEG undecodable → clip drops
    val mdatAt = good.indexOfSlice("mdat".getBytes("US-ASCII"))
    assert(mdatAt > 0)
    val mut = good.updated(mdatAt + 8,
      (good(mdatAt + 8) ^ 0x7f).toByte) // SOI of the first sample
    assert(Mp4Codec.decodeMjpegFrames(mut).isEmpty)
    assert(Mp4Codec.decodeMjpegFrames(Array.empty).isEmpty)
    assert(Mp4Codec.decodeMjpegFrames("not an mp4".getBytes).isEmpty)
    // seeded-random fuzz behind a plausible box header: never throws
    val rnd = new scala.util.Random(777)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(300) + 16)
      rnd.nextBytes(junk)
      junk(4) = 'm'; junk(5) = 'o'; junk(6) = 'o'; junk(7) = 'v'
      Mp4Codec.decodeMjpegFrames(junk) // no throw is the assertion
    }
  }
}
