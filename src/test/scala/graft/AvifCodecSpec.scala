package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AvifCodec, Mp4Codec}

/** The AVIF/HEIC item-path digest tier: meta/pitm/iinf/iloc/iprp
  * walk, re-boxed (idat + split-extent + v1-iloc) fingerprint
  * invariance, truncated-extent drop-whole, and the ipma property
  * discipline. */
class AvifCodecSpec extends AnyFunSuite {

  test("a re-boxed copy (idat carriage, split extents, v1 iloc, " +
      "shuffled meta) fingerprints identically to its primary") {
    val plain = AvifCodec.encodeAvif(23L, 320, 200)
    val d0 = AvifCodec.decodeAvifDigest(plain).get
    assert(d0.codec === "av01")
    assert(d0.width === 320)
    assert(d0.height === 200)
    val re = AvifCodec.encodeAvif(23L, 320, 200, reBoxed = true)
    assert(!re.sameElements(plain))
    val d1 = AvifCodec.decodeAvifDigest(re).get
    assert(d1 === d0)
    // distinct scenes stay distinct
    assert(AvifCodec.decodeAvifDigest(AvifCodec.encodeAvif(24L, 320, 200))
      .get.itemFp !== d0.itemFp)
    // the Exif-tagged twin (a second metadata item beside the
    // untouched primary — the exiftool shape) collapses too
    val tagged = AvifCodec.encodeAvif(23L, 320, 200, exifItem = true)
    assert(!tagged.sameElements(plain))
    assert(tagged.length > plain.length)
    assert(AvifCodec.decodeAvifDigest(tagged).get === d0)
    // ... and a cut into the EXIF item's extent still drops whole —
    // every declared extent must resolve, not just the primary's
    assert(AvifCodec.decodeAvifDigest(
      tagged.take(tagged.length - 5)).isEmpty)
  }

  test("HEIC (hvc1 + hvcC) rides the same walk with its own " +
      "fingerprint family") {
    val h0 = AvifCodec.decodeAvifDigest(
      AvifCodec.encodeAvif(23L, 320, 200, heic = true)).get
    assert(h0.codec === "hvc1")
    // the SAME scene's AVIF and HEIC payloads are distinct families
    val a0 = AvifCodec.decodeAvifDigest(
      AvifCodec.encodeAvif(23L, 320, 200)).get
    assert(h0.itemFp !== a0.itemFp)
    // ... and the HEIC re-box collapses within its family
    val h1 = AvifCodec.decodeAvifDigest(
      AvifCodec.encodeAvif(23L, 320, 200, heic = true,
        reBoxed = true)).get
    assert(h1 === h0)
  }

  test("the digest matches the oracle formula") {
    val d = AvifCodec.decodeAvifDigest(
      AvifCodec.encodeAvif(250L, 64, 64)).get
    def md5s(s: String) = Mp4Codec.md5Hex(s.getBytes("US-ASCII"))
    val head = "av01:250:" + md5s("img250")
    assert(d.itemFp === md5s(head + "." * (600 - head.length)))
  }

  test("truncated extents and malformed items drop whole") {
    val plain = AvifCodec.encodeAvif(31L, 64, 64)
    val re = AvifCodec.encodeAvif(31L, 64, 64, reBoxed = true)
    // a cut anywhere in the trailing mdat leaves the iloc extent (or
    // the top-level tiling) overrunning — drop whole
    assert(AvifCodec.decodeAvifDigest(plain.take(plain.length - 30)).isEmpty)
    assert(AvifCodec.decodeAvifDigest(plain.take(plain.length - 1)).isEmpty)
    // same for the idat-carried form
    assert(AvifCodec.decodeAvifDigest(re.take(re.length - 30)).isEmpty)
    // a pitm pointing at a missing item drops
    val m = plain.clone()
    val pitmAt = m.indexOfSlice("pitm".getBytes("US-ASCII"))
    assert(pitmAt > 0)
    m(pitmAt + 9) = 2
    assert(AvifCodec.decodeAvifDigest(m).isEmpty)
    // a protected item (item_protection_index != 0) drops
    val m2 = plain.clone()
    val infeAt = m2.indexOfSlice("infe".getBytes("US-ASCII"))
    assert(infeAt > 0)
    m2(infeAt + 11) = 1
    assert(AvifCodec.decodeAvifDigest(m2).isEmpty)
    // foreign bytes reject at the gate
    assert(AvifCodec.decodeAvifDigest(Array.emptyByteArray).isEmpty)
    assert(AvifCodec.decodeAvifDigest(
      Array.fill[Byte](64)(0x42)).isEmpty)
    assert(AvifCodec.decodeAvifDigest(
      Mp4Codec.encodeAvcMp4(23L, 3, 64, 64)).isEmpty)
  }
}
