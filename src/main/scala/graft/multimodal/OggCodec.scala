package graft.multimodal

/** Ogg (RFC 3533) container walk for the audio-corpus tier — the
  * OGG half of the lossy-audio gap, closed the same documented way as
  * MP3: Vorbis payloads are NOT synthesized to PCM (no MDCT/floor/
  * residue decode is attempted or implied). The tier walks the REAL
  * page grammar — capture pattern, version 0, header-type flags,
  * granule/serial/sequence fields, the spec's CRC-32 (polynomial
  * 0x04c11db7, unreflected, checksum field zeroed during computation)
  * verified on EVERY page, lacing-value segment tables with
  * 255-continuation packet reassembly across pages — plus the Vorbis
  * identification header (packet type 1, "vorbis" magic, version 0,
  * channels, sample rate) for stream metadata, and surfaces one
  * CONTENT DIGEST per audio packet (the three Vorbis header packets
  * are stream SETUP, not content, and are excluded), reduced to a
  * stream fingerprint.
  *
  * Why this is the scale-relevant surface: the canonical Ogg
  * duplicate is the RE-PAGINATED copy — identical packets under a
  * different page layout (muxers repage freely; granule positions and
  * page sequence numbers all change). Pages are framing, packets are
  * content; digesting packets makes exact dedup invariant under
  * repagination with no audio decoder, while PCM-space NEAR-dup stays
  * on the decodable tiers. A Vorbis packet decoder can slot in behind
  * the same reassembly later.
  *
  * Strictness: every page CRC must verify, sequence numbers must be
  * consecutive per stream, the first page must carry
  * beginning-of-stream and a complete Vorbis identification header,
  * the last must carry end-of-stream, a continued packet must
  * actually span (continuation flag on the next page), and trailing
  * bytes after the EOS page fail. Decode never throws.
  */
object OggCodec {

  /** One Ogg/Vorbis stream's digest view: ident-header metadata plus
    * per-audio-packet digests (setup packets excluded). */
  final case class OggStream(serial: Long, channels: Int,
      sampleRate: Int, packetDigests: Vector[String]) {
    def fingerprint: String = Mp4Codec.md5Hex(
      packetDigests.mkString("").getBytes("US-ASCII"))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  /** RFC 3533 CRC-32: polynomial 0x04c11db7, init 0, no reflection,
    * no final xor. */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[multimodal] def crc(b: Array[Byte], from: Int, until: Int,
      zeroAt: Int = -1): Int = {
    var r = 0
    var i = from
    while (i < until) {
      val v = if (zeroAt >= 0 && i >= zeroAt && i < zeroAt + 4) 0
        else u8(b, i)
      r = (r << 8) ^ CrcTable(((r >>> 24) ^ v) & 0xff)
      i += 1
    }
    r
  }

  private val MaxPackets = 1 << 16

  def decodeOggDigest(b: Array[Byte]): Option[OggStream] =
    try decode0(b)
    catch { case _: RuntimeException => None }

  private def decode0(b: Array[Byte]): Option[OggStream] = {
    if (b.length < 28) return None
    var p = 0
    var pageNo = -1L
    var serial = 0L
    var sawBos = false
    var sawEos = false
    var channels = 0
    var sampleRate = 0
    val packets = Vector.newBuilder[Array[Byte]]
    var carry = new java.io.ByteArrayOutputStream()
    var carryOpen = false
    var nPackets = 0

    while (p < b.length) {
      if (sawEos) return None              // bytes after the EOS page
      if (p + 27 > b.length) return None
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S') return None
      if (u8(b, p + 4) != 0) return None   // version
      val flags = u8(b, p + 5)
      val cont = (flags & 1) != 0
      val bos = (flags & 2) != 0
      val eos = (flags & 4) != 0
      val pageSerial = le32(b, p + 14)
      val seq = le32(b, p + 18)
      val wantCrc = le32(b, p + 22)
      val nSegs = u8(b, p + 26)
      val segTable = p + 27
      if (segTable + nSegs > b.length) return None
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += u8(b, segTable + i); i += 1 }
      val body = segTable + nSegs
      val pageEnd = body + bodyLen
      if (pageEnd > b.length) return None
      // CRC over the whole page with the checksum field zeroed
      if ((crc(b, p, pageEnd, zeroAt = p + 22) & 0xffffffffL) != wantCrc)
        return None

      if (pageNo < 0) {
        if (!bos || seq != 0) return None
        serial = pageSerial
        sawBos = true
      } else {
        if (bos) return None               // single logical stream
        if (pageSerial != serial) return None
        if (seq != pageNo + 1) return None // lost page
      }
      pageNo = seq
      if (cont != carryOpen) return None   // continuation mismatch
      if (eos) sawEos = true

      // packet reassembly: each lacing value < 255 ends a packet;
      // a trailing 255 leaves the packet open across the page edge
      var q = body
      i = 0
      while (i < nSegs) {
        val lace = u8(b, segTable + i)
        carry.write(b, q, lace)
        q += lace
        if (lace < 255) {
          packets += carry.toByteArray
          carry = new java.io.ByteArrayOutputStream()
          carryOpen = false
          nPackets += 1
          if (nPackets > MaxPackets) return None
        } else carryOpen = true
        i += 1
      }
      p = pageEnd
    }
    if (!sawBos || !sawEos || carryOpen) return None
    val all = packets.result()
    // the three Vorbis header packets: identification, comment, setup
    if (all.length < 3) return None
    val ident = all(0)
    if (ident.length < 30 || u8(ident, 0) != 1 ||
        new String(ident, 1, 6, "US-ASCII") != "vorbis") return None
    if (le32(ident, 7) != 0) return None   // vorbis version
    channels = u8(ident, 11)
    sampleRate = le32(ident, 12).toInt
    if (channels < 1 || sampleRate <= 0) return None
    if (all(1).length < 7 || u8(all(1), 0) != 3 ||
        new String(all(1), 1, 6, "US-ASCII") != "vorbis") return None
    if (all(2).length < 7 || u8(all(2), 0) != 5 ||
        new String(all(2), 1, 6, "US-ASCII") != "vorbis") return None
    val audio = all.drop(3)
    if (audio.isEmpty) return None
    Some(OggStream(serial, channels, sampleRate,
      audio.map(pk => Mp4Codec.md5Hex(pk))))
  }

  // ---- fixture encoder ----

  /** The deterministic ascii audio-packet payload of packet `k` —
    * "ogg:{scene}:{k}:" + md5("g{scene}_{k}"), dot-padded to `len`:
    * pure md5 arithmetic the DuckDB oracle recomputes verbatim. */
  private[multimodal] def packetPayload(scene: Long, k: Int,
      len: Int): Array[Byte] = {
    val head = s"ogg:$scene:$k:" +
      Mp4Codec.md5Hex(s"g${scene}_$k".getBytes("UTF-8"))
    require(head.length <= len, "packet too small")
    (head + "." * (len - head.length)).getBytes("US-ASCII")
  }

  private def identPacket(channels: Int, rate: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(1); o.write("vorbis".getBytes("US-ASCII"))
    def le(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    le(0)                                  // version
    o.write(channels)
    le(rate)
    le(0); le(rate * 16); le(0)            // bitrate max/nominal/min
    o.write(0xb8)                          // blocksizes 2^8 / 2^11
    o.write(1)                             // framing bit
    o.toByteArray
  }

  private def headerPacket(typ: Int, body: String): Array[Byte] =
    (typ.toByte +: "vorbis".getBytes("US-ASCII")) ++
      body.getBytes("US-ASCII") :+ 1.toByte

  /** Encode a planted Ogg/Vorbis-framed stream: the three header
    * packets on page 0 (BOS), then `nPackets` deterministic audio
    * packets of `packetLen` bytes laid out `packetsPerPage` at a time
    * (packets longer than 255 exercise multi-lacing reassembly;
    * `splitAcrossPages` ends a page mid-packet so the 255-continuation
    * path runs for real). Re-paginated copies (different layout knobs)
    * keep the identical packets — the fingerprint must not move. */
  def encodeOgg(scene: Long, nPackets: Int, channels: Int = 1,
      rate: Int = 8000, serial: Long = 0x67726166L,
      packetLen: Int = 300, packetsPerPage: Int = 2,
      splitAcrossPages: Boolean = false): Array[Byte] = {
    require(nPackets >= 1 && packetLen >= 60 && packetsPerPage >= 1)
    val out = new java.io.ByteArrayOutputStream()
    var seq = 0L

    def page(flags: Int, granule: Long,
        segments: Seq[Array[Byte]], openTail: Boolean): Unit = {
      // lacing: each segment laced independently; an "open" final
      // segment is a packet prefix whose length must be ≡ 0 mod 255
      val laces = Seq.newBuilder[Int]
      segments.zipWithIndex.foreach { case (s, i) =>
        val open = openTail && i == segments.length - 1
        var rem = s.length
        while (rem >= 255) { laces += 255; rem -= 255 }
        if (!open) laces += rem
        else require(rem == 0, "open packet tail must lace to 255s")
      }
      val lace = laces.result()
      require(lace.length <= 255, "too many segments for one page")
      val header = new java.io.ByteArrayOutputStream()
      header.write("OggS".getBytes("US-ASCII"))
      header.write(0); header.write(flags)
      var g = granule
      var i = 0
      while (i < 8) { header.write((g & 0xff).toInt); g >>= 8; i += 1 }
      def le(v: Long): Unit = {
        header.write((v & 0xff).toInt); header.write(((v >> 8) & 0xff).toInt)
        header.write(((v >> 16) & 0xff).toInt)
        header.write(((v >> 24) & 0xff).toInt)
      }
      le(serial); le(seq); le(0)           // CRC placeholder
      header.write(lace.length)
      lace.foreach(header.write)
      val hb = header.toByteArray
      val bb = segments.toArray.flatten
      val pageBytes = hb ++ bb
      val c = crc(pageBytes, 0, pageBytes.length)
      pageBytes(22) = (c & 0xff).toByte
      pageBytes(23) = ((c >> 8) & 0xff).toByte
      pageBytes(24) = ((c >> 16) & 0xff).toByte
      pageBytes(25) = ((c >>> 24) & 0xff).toByte
      out.write(pageBytes)
      seq += 1
    }

    // page 0: BOS with the identification header alone (the spec's
    // required layout), then comment+setup on page 1
    page(2, 0, Seq(identPacket(channels, rate)), openTail = false)
    page(0, 0, Seq(
      headerPacket(3, s"comment-for-$scene"),
      headerPacket(5, s"setup-for-$scene")), openTail = false)

    val pkts = Array.tabulate(nPackets)(k =>
      packetPayload(scene, k, packetLen))
    var k = 0
    while (k < nPackets) {
      val n = math.min(packetsPerPage, nPackets - k)
      val group = (0 until n).map(j => pkts(k + j))
      val last = k + n >= nPackets
      if (splitAcrossPages && !last && (k / packetsPerPage) % 2 == 0) {
        // end this page mid-packet: emit the group plus the next
        // packet's first 255-multiple prefix, continue it on the
        // following page
        val nxt = pkts(k + n)
        val cut = (nxt.length / 255) * 255
        if (cut > 0) {
          page(0, (k + n).toLong * 256, group :+ nxt.take(cut),
            openTail = true)
          val contEos = if (k + n + 1 >= nPackets) 4 else 0
          page(1 | contEos, (k + n + 1).toLong * 256,
            Seq(nxt.drop(cut)), openTail = false)
          k += n + 1
        } else {
          page(0, (k + n).toLong * 256, group, openTail = false)
          k += n
        }
      } else {
        page(if (last) 4 else 0, (k + n).toLong * 256, group,
          openTail = false)
        k += n
      }
    }
    out.toByteArray
  }
}
