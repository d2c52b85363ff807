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
    // an unknown-size TRACKS element (all-ones size vint) rejects —
    // only Segment and Cluster are unknown-size-allowed
    val trkAt = good.indexOfSlice(
      Array[Byte](0x16, 0x54.toByte, 0xAE.toByte, 0x6B))
    assert(trkAt > 0)
    val trkSzLen =
      java.lang.Integer.numberOfLeadingZeros(good(trkAt + 4) & 0xff) - 23
    assert(trkSzLen === 1, "fixture tracks size is a 1-byte vint")
    val unkTrk = good.clone()
    unkTrk(trkAt + 4) = 0xff.toByte
    assert(WebmCodec.decodeWebmDigest(unkTrk).isEmpty)
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

  test("unknown-size Segment and Clusters (the MediaRecorder shape) " +
      "collapse onto the sized primary") {
    val sized = WebmCodec.encodeWebm(21L, 5)
    val ds = WebmCodec.decodeWebmDigest(sized).get
    // unknown-size segment, sized clusters
    val unkSeg = WebmCodec.encodeWebm(21L, 5, unknownSizeSegment = true)
    // the full live-capture shape: unknown segment AND clusters
    val unkBoth = WebmCodec.encodeWebm(21L, 5,
      unknownSizeSegment = true, unknownSizeClusters = true)
    // unknown clusters inside a SIZED segment
    val unkClu = WebmCodec.encodeWebm(21L, 5,
      unknownSizeClusters = true)
    val all = Seq(sized, unkSeg, unkBoth, unkClu)
    for (i <- all.indices; j <- all.indices if i < j)
      assert(!all(i).sameElements(all(j)), s"$i/$j byte-identical")
    for (x <- Seq(unkSeg, unkBoth, unkClu)) {
      val d = WebmCodec.decodeWebmDigest(x).get
      assert(d.frameDigests === ds.frameDigests)
      assert(d.fingerprint === ds.fingerprint)
    }
    // lacing and block-grouping still collapse under the unknown form
    val laced = WebmCodec.encodeWebm(21L, 5, framesPerCluster = 3,
      lacing = 1, unknownSizeSegment = true,
      unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(laced).get.fingerprint ===
      ds.fingerprint)
    // the audio sibling filter holds under the unknown form too
    val sib = WebmCodec.encodeWebm(21L, 5, audioSibling = true,
      unknownSizeSegment = true, unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(sib).get.fingerprint ===
      ds.fingerprint)
  }

  test("unknown-size strictness: mid-element cuts drop whole, " +
      "element-boundary cuts are legal shorter streams, and an " +
      "unrecognized child in an unknown cluster rejects") {
    val unk = WebmCodec.encodeWebm(13L, 4,
      unknownSizeSegment = true, unknownSizeClusters = true)
    val full = WebmCodec.decodeWebmDigest(unk).get
    assert(full.frameDigests.length === 4)
    // a cut 40 bytes short lands inside the last block's 180-byte
    // frame payload → the known block size overruns → None
    assert(WebmCodec.decodeWebmDigest(
      unk.take(unk.length - 40)).isEmpty)
    // with 2 frames/cluster, cutting the entire LAST CLUSTER lands on
    // an element boundary — a structurally complete shorter capture
    // (the live-mux reality: the recorder died mid-stream)
    val lastClusterAt = {
      // cluster id 1F43B675 — find the final occurrence
      var at = -1; var from = 0
      val pat = Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75)
      var x = unk.indexOfSlice(pat, from)
      while (x >= 0) { at = x; x = unk.indexOfSlice(pat, x + 1) }
      at
    }
    val shorter = WebmCodec.decodeWebmDigest(unk.take(lastClusterAt))
    assert(shorter.exists(_.frameDigests == full.frameDigests.take(2)))
    // element-boundary cuts inside the last cluster are ALSO legal
    // shorter captures: right after the unknown-size cluster header
    // (+5: an empty cluster) and right after its 3-byte Timecode
    // (+8) — both still carry only the first two frames
    for (n <- Seq(lastClusterAt + 5, lastClusterAt + 8))
      assert(WebmCodec.decodeWebmDigest(unk.take(n))
        .exists(_.frameDigests == full.frameDigests.take(2)), s"@$n")
    // every mid-element cut near the end drops whole
    for (n <- (lastClusterAt + 1 until lastClusterAt + 12)
        if n != lastClusterAt + 5 && n != lastClusterAt + 8)
      assert(WebmCodec.decodeWebmDigest(unk.take(n)).isEmpty, s"@$n")
    // an unrecognized child ID inside an unknown-size cluster is
    // indistinguishable from the cluster's end → drop whole. Patch
    // the Timecode id byte (0xE7, first child of the last cluster)
    // to a foreign one-byte id
    val foreign = unk.clone()
    assert((foreign(lastClusterAt + 5) & 0xff) === 0xE7)
    foreign(lastClusterAt + 5) = 0xD9.toByte
    assert(WebmCodec.decodeWebmDigest(foreign).isEmpty)
    // trailing garbage after the final cluster of an unknown-size
    // segment fails the exact-tiling rule
    assert(WebmCodec.decodeWebmDigest(unk ++ "x".getBytes).isEmpty)
  }

  test("duplicate TrackEntry numbers and size-0 laced frames reject") {
    // duplicate track number: patch the audio sibling's TrackNumber
    // (the SECOND TrackEntry, number 2) to collide with the video
    // track's 1 — two entries sharing a number would merge their
    // blocks into one digest stream, so the gate must drop whole
    val sib = WebmCodec.encodeWebm(17L, 3, audioSibling = true)
    assert(WebmCodec.decodeWebmDigest(sib).isDefined)
    val pat = Array[Byte](0xD7.toByte, 0x81.toByte, 2)
    val dupAt = sib.indexOfSlice(pat)
    assert(dupAt > 0)
    val dup = sib.clone(); dup(dupAt + 2) = 1
    assert(WebmCodec.decodeWebmDigest(dup).isEmpty)
    // size-0 laced frames reject in the XIPH path too (consistency
    // with the EBML delta path's prev<=0 rule): take a 2-frame Xiph
    // lace (one size byte, 180) and zero the size entry — the lace
    // still tiles (remainder absorbs all 360 bytes), so only the
    // explicit size-0 rule can reject it
    val laced = WebmCodec.encodeWebm(19L, 2, framesPerCluster = 2,
      lacing = 1)
    assert(WebmCodec.decodeWebmDigest(laced).isDefined)
    val sbAt = laced.indexOfSlice(Array[Byte](0xA3.toByte), 4)
    assert(sbAt > 0)
    val szLen =
      java.lang.Integer.numberOfLeadingZeros(laced(sbAt + 1) & 0xff) - 23
    val bodyAt = sbAt + 1 + szLen
    assert((laced(bodyAt + 3) & 0x06) === 0x02, "xiph lacing flags")
    assert((laced(bodyAt + 4) & 0xff) === 1, "two frames in the lace")
    assert((laced(bodyAt + 5) & 0xff) === 180, "first frame's size")
    val zeroLace = laced.clone(); zeroLace(bodyAt + 5) = 0
    assert(WebmCodec.decodeWebmDigest(zeroLace).isEmpty)
  }

  test("CRC-32 elements are verified and excluded from content") {
    val plain = WebmCodec.encodeWebm(23L, 4)
    val dp = WebmCodec.decodeWebmDigest(plain).get
    // checksummed framing (CRC-32 first child of Tracks + every
    // Cluster): byte-distinct, the same fingerprint
    val crcd = WebmCodec.encodeWebm(23L, 4, crc32Elements = true)
    assert(!crcd.sameElements(plain))
    val dc = WebmCodec.decodeWebmDigest(crcd).get
    assert(dc.frameDigests === dp.frameDigests)
    assert(dc.fingerprint === dp.fingerprint)
    // BlockGroup CRC children verify too
    val grouped = WebmCodec.encodeWebm(23L, 4, useBlockGroups = true,
      crc32Elements = true)
    assert(WebmCodec.decodeWebmDigest(grouped).get.fingerprint ===
      dp.fingerprint)
    // … and under the unknown-size forms (deferred verification)
    val unk = WebmCodec.encodeWebm(23L, 4, crc32Elements = true,
      unknownSizeSegment = true, unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(unk).get.fingerprint ===
      dp.fingerprint)
    // a damaged CONTENT byte under a CRC must now fail the file
    // whole (without the CRC it would silently digest differently):
    // flip a dot in the last frame's payload
    def flipTail(x: Array[Byte]): Array[Byte] = {
      val m = x.clone()
      val at = m.length - 10
      assert(m(at) === '.'.toByte)
      m(at) = ','.toByte
      m
    }
    assert(WebmCodec.decodeWebmDigest(flipTail(crcd)).isEmpty)
    assert(WebmCodec.decodeWebmDigest(flipTail(unk)).isEmpty)
    // without a CRC the same flip digests (differently) — proving
    // the rejection above comes from CRC verification, not tiling
    assert(WebmCodec.decodeWebmDigest(flipTail(plain))
      .exists(_.fingerprint != dp.fingerprint))
    // a damaged CRC VALUE byte fails too
    val bfAt = crcd.indexOfSlice(Array[Byte](0xBF.toByte, 0x84.toByte))
    assert(bfAt > 0)
    val badCrc = crcd.clone()
    badCrc(bfAt + 2) = (badCrc(bfAt + 2) ^ 0x40).toByte
    assert(WebmCodec.decodeWebmDigest(badCrc).isEmpty)
    // a malformed CRC element (wrong payload size) fails
    val shortCrc = crcd.clone()
    shortCrc(bfAt + 1) = 0x83.toByte
    assert(WebmCodec.decodeWebmDigest(shortCrc).isEmpty)
  }

  test("a re-tagged copy (Tags element appended) collapses onto its " +
      "untagged primary") {
    val plain = WebmCodec.encodeWebm(29L, 3)
    val tagged = WebmCodec.encodeWebm(29L, 3, tagsElement = true)
    assert(!tagged.sameElements(plain))
    assert(tagged.length > plain.length)
    val dp = WebmCodec.decodeWebmDigest(plain).get
    val dt = WebmCodec.decodeWebmDigest(tagged).get
    assert(dt.frameDigests === dp.frameDigests)
    assert(dt.fingerprint === dp.fingerprint)
    // tags + CRC together (the mkvpropedit-on-mkvmerge-output shape)
    val both = WebmCodec.encodeWebm(29L, 3, tagsElement = true,
      crc32Elements = true)
    assert(WebmCodec.decodeWebmDigest(both).get.fingerprint ===
      dp.fingerprint)
    // a Tags element TRUNCATED mid-way breaks the segment tiling
    assert(WebmCodec.decodeWebmDigest(
      tagged.take(tagged.length - 5)).isEmpty)
  }

  test("a trailing top-level-adjacent Void is attributed to the " +
      "Segment, not absorbed into an unknown-size cluster") {
    val dp = WebmCodec.decodeWebmDigest(WebmCodec.encodeWebm(31L, 4)).get
    // Void is a valid Cluster child AND a valid top-level element —
    // after an unknown-size cluster the grouping is ambiguous. The
    // walk excludes a trailing Void run from the cluster's extent,
    // so a CRC-leading unknown-size cluster is never verified over
    // Void bytes the muxer wrote at the Segment level.
    val voidEl = Array[Byte](0xEC.toByte, 0x82.toByte, 0, 0)
    val unk = WebmCodec.encodeWebm(31L, 4,
      unknownSizeSegment = true, unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(unk ++ voidEl)
      .exists(_.fingerprint == dp.fingerprint))
    // with CRC-32 framing the choice is OBSERVABLE: absorbing the
    // Void would stretch the deferred checksum over it and drop a
    // structurally valid file — the exclusion keeps it green
    val crcd = WebmCodec.encodeWebm(31L, 4, crc32Elements = true,
      unknownSizeSegment = true, unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(crcd ++ voidEl)
      .exists(_.fingerprint == dp.fingerprint))
    // two stacked Voids (a trailing RUN) exclude together
    assert(WebmCodec.decodeWebmDigest(crcd ++ voidEl ++ voidEl)
      .exists(_.fingerprint == dp.fingerprint))
  }

  test("a CRC-32 element past the first-child position rejects " +
      "(RFC 8794 forbids the placement — never skipped unverified)") {
    val crc0 = Array[Byte](0xBF.toByte, 0x84.toByte, 0, 0, 0, 0)
    // appended at EOF under an unknown-size SEGMENT = a top-level
    // CRC past the first child: malformed framing, drop whole
    val unkSeg = WebmCodec.encodeWebm(31L, 4, unknownSizeSegment = true)
    assert(WebmCodec.decodeWebmDigest(unkSeg).nonEmpty)
    assert(WebmCodec.decodeWebmDigest(unkSeg ++ crc0).isEmpty)
    // appended at EOF under an unknown-size CLUSTER = a cluster
    // child CRC past the first position: same rule
    val unkAll = WebmCodec.encodeWebm(31L, 4,
      unknownSizeSegment = true, unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(unkAll).nonEmpty)
    assert(WebmCodec.decodeWebmDigest(unkAll ++ crc0).isEmpty)
    // a mis-placed CRC with a CORRECT first-child CRC ahead of it
    // still rejects — position, not value, is what's malformed
    val crcd = WebmCodec.encodeWebm(31L, 4, crc32Elements = true,
      unknownSizeSegment = true, unknownSizeClusters = true)
    assert(WebmCodec.decodeWebmDigest(crcd).nonEmpty)
    assert(WebmCodec.decodeWebmDigest(crcd ++ crc0).isEmpty)
  }
}
