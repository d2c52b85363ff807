package graft.multimodal

/** Sample-level audio codec for the perceptual-fingerprint tier — REAL
  * PCM decode with no codec library: RIFF/WAVE chunk walk to `fmt ` +
  * `data` (16- or 24-bit little-endian samples; plain PCM or
  * WAVE_FORMAT_EXTENSIBLE with the PCM subformat GUID), the AIFF
  * FORM/COMM/SSND walk (big-endian samples, 80-bit extended sample
  * rate), stereo downmixed to mono by the exact integer mean
  * ⌊(l + r) / 2⌋. That covers the decode side an audio near-dup needs
  * (re-encoded containers with extra metadata chunks, resampled
  * renderings, channel-layout conversions, bit-depth remasters, and
  * cross-container copies of one recording all reach the same — or
  * exactly scaled — energy envelope); FLAC decodes through
  * [[FlacCodec]]'s lossless tier; lossy codecs (MP3/AAC/Opus) stay
  * behind the open codec seam ([[Multimodal.MediaDecoder]]) — lossy
  * audio would need the JPEG-style exactness trick or tolerance
  * anchors, not the bit-exact fixture discipline.
  *
  * The fingerprint is the audio analog of [[PixelCodec]]'s dHash:
  * partition the mono sample stream into 64 bins (sample i → bin
  * ⌊64·i/n⌋ — the same bin rule as [[PixelCodec.lumaGrid8]], exact at
  * any length ≥ 64), take the floor-mean absolute amplitude per bin
  * (the energy envelope), and set bit k when bin (k+1) mod 64 is
  * strictly louder than bin k. Gradient signs survive exact gain
  * changes and resampling of block-constant fixtures; byte identity
  * does not — the near-dup signal. Everything is deterministic integer
  * arithmetic, so the DuckDB oracle recomputes expected fingerprints
  * from the fixture-planting formula (md5-mixed segment amplitudes,
  * [[segmentAmp]]) and the tier is hash-checked end to end.
  *
  * Hostile-input discipline matches [[PixelCodec]]: decode never
  * throws — truncated chunks, declared sizes past the buffer, missing
  * fmt/data, non-PCM formats, or sub-64-sample streams return None.
  */
object AudioCodec {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  /** Decoded mono PCM: signed integer samples (stereo already
    * downmixed; 16-bit magnitude for 16-bit containers, 24-bit for
    * 24-bit ones — the envelope's gradient signs are scale-invariant),
    * plus the container's declared rate. */
  case class Pcm(sampleRate: Int, samples: Array[Int])

  /** The KSDATAFORMAT_SUBTYPE_PCM GUID a WAVE_FORMAT_EXTENSIBLE fmt
    * chunk carries (little-endian fields, RFC 2361 / mmreg.h):
    * 00000001-0000-0010-8000-00aa00389b71. */
  private val PcmGuid: Array[Byte] = Array(
    0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
    0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71).map(_.toByte)

  /** Decode a RIFF/WAVE file holding integer PCM — format tag 1, or
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE) with the PCM subformat GUID —
    * at 16 or 24 bits, or G.711 companded audio (tag 7 μ-law / 6
    * A-law, 8-bit codewords expanded to 16-bit scale), 1 or 2
    * channels, to mono samples. Unknown chunks (LIST metadata etc.)
    * are skipped — a re-encoded container with stripped/added tags
    * decodes to the same samples. None on anything malformed. */
  def decodePcmWav(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')) return None
    var p = 12
    var rate = 0; var channels = 0; var bits = 0; var haveFmt = false
    var dataOff = -1; var dataLen = 0; var law = 0
    while (p + 8 <= b.length && (!haveFmt || dataOff < 0)) {
      val id = new String(b, p, 4, "US-ASCII")
      val sz = le32(b, p + 4)
      if (sz < 0 || p + 8 + sz > b.length) return None // declared past buffer
      if (id == "fmt " && sz >= 16) {
        val tag = le16(b, p + 8)
        if (tag == 0xfffe) {
          // extensible: cbSize >= 22, SubFormat GUID at fmt+24 must
          // be integer PCM (the GUID's first u16 is the wrapped tag)
          if (sz < 40 ||
              !java.util.Arrays.equals(
                java.util.Arrays.copyOfRange(b, p + 32, p + 48),
                PcmGuid)) return None
        } else if (tag == 6 || tag == 7) law = tag     // G.711 A-law/μ-law
        else if (tag != 1) return None                 // PCM only
        channels = le16(b, p + 10)
        rate = le32(b, p + 12).toInt
        bits = le16(b, p + 22)
        haveFmt = true
      } else if (id == "data") {
        dataOff = p + 8; dataLen = sz.toInt
      }
      p += 8 + sz.toInt + (sz.toInt & 1)               // word-aligned
    }
    if (!haveFmt || dataOff < 0 || rate <= 0 ||
        (channels != 1 && channels != 2)) return None
    // G.711 carries 8-bit codewords; linear PCM is 16 or 24 bit
    if (law != 0) { if (bits != 8) return None }
    else if (bits != 16 && bits != 24) return None
    val sampleBytes = bits / 8
    val frameBytes = channels * sampleBytes
    val n = dataLen / frameBytes
    if (n <= 0) return None
    def sample(off: Int): Int =
      if (law == 7) MuLawTable(u8(b, off))
      else if (law == 6) ALawTable(u8(b, off))
      else if (sampleBytes == 2) le16(b, off).toShort.toInt
      else (u8(b, off) | (u8(b, off + 1) << 8) |
        (b(off + 2).toInt << 16))                      // sign-extends
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val off = dataOff + i * frameBytes
      val s0 = sample(off)
      out(i) =
        if (channels == 1) s0
        else Math.floorDiv(s0 + sample(off + sampleBytes), 2)
      i += 1
    }
    Some(Pcm(rate, out))
  }

  /** Decode an AIFF (IFF FORM/AIFF) file holding 16-bit big-endian
    * PCM, 1 or 2 channels, to mono samples — the Apple-lineage
    * container a real audio corpus carries next to WAV. The COMM
    * chunk's sample rate is an 80-bit IEEE 754 extended float
    * (sign/15-bit exponent/explicit-integer-bit 64-bit mantissa);
    * integral rates recover exactly from the top mantissa bits.
    * Unknown chunks are skipped; None on anything malformed. */
  def decodeAiff16(b: Array[Byte]): Option[Pcm] = {
    def be16(i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    def be32(i: Int): Long =
      ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3))
    if (b.length < 12 || !(b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
        b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
        b(11) == 'F')) return None
    var p = 12
    var rate = 0; var channels = 0; var bits = 0; var haveComm = false
    var nFrames = 0L
    var sndOff = -1; var sndLen = 0
    while (p + 8 <= b.length && (!haveComm || sndOff < 0)) {
      val id = new String(b, p, 4, "US-ASCII")
      val sz = be32(p + 4)
      if (sz < 0 || p + 8 + sz > b.length) return None
      if (id == "COMM" && sz >= 18) {
        channels = be16(p + 8)
        nFrames = be32(p + 10)
        bits = be16(p + 14)
        // 80-bit extended float at +16: 1 sign + 15 exponent bits,
        // then a 64-bit mantissa with an explicit integer bit
        val exp = be16(p + 16) & 0x7fff
        val mantHi = be32(p + 18)
        val shift = 16383 + 31 - exp
        if ((be16(p + 16) & 0x8000) != 0 || shift < 0 || shift > 31)
          return None
        rate = (mantHi >>> shift).toInt
        haveComm = true
      } else if (id == "SSND") {
        if (sz < 8) return None
        // SSND payload: offset u32 + blockSize u32, then sample data
        val off = be32(p + 8)
        if (off < 0 || 8 + off > sz) return None
        sndOff = p + 16 + off.toInt
        sndLen = (sz - 8 - off).toInt
      }
      p += 8 + sz.toInt + (sz.toInt & 1)               // chunks even-padded
    }
    if (!haveComm || sndOff < 0 || bits != 16 || rate <= 0 ||
        (channels != 1 && channels != 2)) return None
    val frameBytes = channels * 2
    val n = math.min(sndLen / frameBytes, nFrames).toInt
    if (n <= 0) return None
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val off = sndOff + i * frameBytes
      val s0 = be16(off).toShort.toInt
      out(i) =
        if (channels == 1) s0
        else Math.floorDiv(s0 + be16(off + 2).toShort.toInt, 2)
      i += 1
    }
    Some(Pcm(rate, out))
  }

  /** 64-bin energy envelope: bin b = floor-mean of |sample| over
    * {i : ⌊64·i/n⌋ = b}. None below 64 samples (empty bins). */
  def energyEnvelope(samples: Array[Int]): Option[Array[Long]] = {
    val n = samples.length
    if (n < 64) return None
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < n) {
      // i*64 stays in Long for any decodable payload
      val b = (i.toLong * 64 / n).toInt
      sums(b) += math.abs(samples(i))
      cnts(b) += 1
      i += 1
    }
    val out = new Array[Long](64)
    var b = 0
    while (b < 64) { out(b) = sums(b) / cnts(b); b += 1 }
    Some(out)
  }

  /** 64-bit gradient fingerprint over the envelope: bit k set when bin
    * (k+1) mod 64 is strictly louder than bin k (the dHash rule on one
    * 64-long row, wrapping 63→0). */
  def fingerprint64(env: Array[Long]): Long = {
    require(env.length == 64, "fingerprint64 expects 64 energy bins")
    var h = 0L
    var k = 0
    while (k < 64) {
      if (env((k + 1) % 64) > env(k)) h |= 1L << k
      k += 1
    }
    h
  }

  /** Sample decode across the supported containers: RIFF/PCM WAV
    * (16/24-bit, plain or WAVE_FORMAT_EXTENSIBLE), AIFF (big-endian
    * PCM), and FLAC via [[FlacCodec]]'s lossless tier — all land mono
    * samples under the same ⌊(l+r)/2⌋ downmix, so an AIFF or FLAC
    * re-encode of a WAV recording reaches the identical envelope (a
    * 24-bit remaster reaches it ×256 — gradient signs are
    * scale-invariant). */
  def decodeAudio(payload: Array[Byte]): Option[Pcm] =
    decodePcmWav(payload).orElse(FlacCodec.decodeFlac16(payload))
      .orElse(decodeAiff16(payload))

  /** Payload → audio fingerprint in one step (None = not decodable
    * 16-bit PCM/FLAC, or under 64 samples). */
  def afp(payload: Array[Byte]): Option[Long] =
    decodeAudio(payload).map(_.samples).flatMap(energyEnvelope)
      .map(fingerprint64)

  // ---- encoders (fixture planting + spec round-trips) ----

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)

  /** Encode mono/stereo 16-bit PCM as a canonical WAV; `extraChunk`
    * plants a LIST metadata chunk BEFORE data (bytes a tag stripper
    * would remove — the re-encode variant). For stereo, `samples`
    * holds interleaved L,R frames. */
  def encodeWav16(samples: Array[Int], sampleRate: Int, channels: Int,
      extraChunk: Option[String] = None): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(samples.length % channels == 0)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(i * 2) = (samples(i) & 0xff).toByte
      data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val extra = extraChunk.map { t =>
      val payload = ("INFO" + t).getBytes("US-ASCII")
      val padded = if (payload.length % 2 == 1) payload :+ 0.toByte
        else payload
      "LIST".getBytes("US-ASCII") ++ le32b(payload.length) ++ padded
    }.getOrElse(Array.emptyByteArray)
    val blockAlign = channels * 2
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32b(16) ++
      le16b(1) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(sampleRate * blockAlign) ++ le16b(blockAlign) ++ le16b(16)
    val dataC = "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ extra ++ dataC
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  // ---- G.711 companding (ITU-T G.711 μ-law / A-law) ----
  //
  // The telephony/call-center slice of a real audio corpus: 8-bit
  // logarithmic codewords, format tags 7 (μ-law) and 6 (A-law),
  // decoded to 16-bit-scale linear PCM through the standard segment/
  // mantissa expansion. Decode is exact table arithmetic; the tier is
  // a DECODE CAPABILITY verified by spec (like sub-byte PNG depths):
  // the planted md5-envelope families stay linear-PCM because
  // companding quantizes amplitudes (step up to 256 at the top
  // segment, envelope gaps are 64), so a companded variant could not
  // share its twin's fingerprint bits — capability and oracle
  // families are deliberately different populations here.

  /** μ-law codeword → linear (±32124, 16-bit scale). */
  private[graft] def muLawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law codeword → linear (±32256, 16-bit scale). */
  private[graft] def aLawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  private[graft] val MuLawTable: Array[Int] =
    Array.tabulate(256)(muLawToLinear)
  private[graft] val ALawTable: Array[Int] =
    Array.tabulate(256)(aLawToLinear)

  /** Linear (16-bit scale) → μ-law codeword (clip at ±32635). */
  private[graft] def linearToMuLaw(pcm: Int): Int = {
    var x = pcm
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** Linear (16-bit scale) → A-law codeword. */
  private[graft] def linearToALaw(pcm: Int): Int = {
    var x = pcm >> 3                       // 13-bit magnitude domain
    val mask = if (x >= 0) 0xd5 else { x = -x - 1; 0x55 }
    var seg = 0
    while (seg < 8 && x > ((0x1f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val aval = (seg << 4) |
        (if (seg < 2) (x >> 1) & 0x0f else (x >> seg) & 0x0f)
      aval ^ mask
    }
  }

  /** Encode G.711 codewords as an 8-bit WAV (format tag 7 = μ-law,
    * 6 = A-law; 18-byte fmt with cbSize 0, the non-PCM convention).
    * `codes` holds interleaved frames for stereo. */
  def encodeWavG711(codes: Array[Int], sampleRate: Int, channels: Int,
      aLaw: Boolean): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(codes.length % channels == 0)
    val data = codes.map(c => (c & 0xff).toByte)
    val tag = if (aLaw) 6 else 7
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32b(18) ++
      le16b(tag) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(sampleRate * channels) ++ le16b(channels) ++ le16b(8) ++
      le16b(0)
    val dataC = "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
    val pad = if (data.length % 2 == 1) Array(0.toByte)
      else Array.emptyByteArray
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ dataC ++ pad
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  /** Encode mono/stereo 24-bit PCM as a canonical WAV (the hi-res
    * remaster shape): 3-byte little-endian samples, format tag 1. */
  def encodeWav24(samples: Array[Int], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(samples.length % channels == 0)
    val data = new Array[Byte](samples.length * 3)
    var i = 0
    while (i < samples.length) {
      data(i * 3) = (samples(i) & 0xff).toByte
      data(i * 3 + 1) = ((samples(i) >> 8) & 0xff).toByte
      data(i * 3 + 2) = ((samples(i) >> 16) & 0xff).toByte
      i += 1
    }
    val blockAlign = channels * 3
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32b(16) ++
      le16b(1) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(sampleRate * blockAlign) ++ le16b(blockAlign) ++ le16b(24)
    val dataC = "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ dataC
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  /** Encode 16-bit PCM as a WAVE_FORMAT_EXTENSIBLE WAV (format tag
    * 0xFFFE, 40-byte fmt with the PCM subformat GUID and a channel
    * mask) — the multichannel-era header modern writers emit even for
    * mono/stereo. */
  def encodeWav16Ext(samples: Array[Int], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(samples.length % channels == 0)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(i * 2) = (samples(i) & 0xff).toByte
      data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val blockAlign = channels * 2
    val mask = if (channels == 1) 0x4 else 0x3   // FC | (FL+FR)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32b(40) ++
      le16b(0xfffe) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(sampleRate * blockAlign) ++ le16b(blockAlign) ++ le16b(16) ++
      le16b(22) ++ le16b(16) ++ le32b(mask) ++ PcmGuid
    val dataC = "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ dataC
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  /** Encode mono/stereo 16-bit PCM as an AIFF: FORM/AIFF with COMM
    * (80-bit extended sample rate) + SSND, big-endian samples. */
  def encodeAiff16(samples: Array[Int], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(samples.length % channels == 0 && sampleRate > 0)
    def be16b(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32b(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // 80-bit extended: normalize the integral rate to 1.m × 2^k
    val k = 31 - java.lang.Integer.numberOfLeadingZeros(sampleRate)
    val exp = 16383 + k
    val mantHi = sampleRate << (31 - k)   // integer bit at bit 31
    val ext = be16b(exp) ++ be32b(mantHi) ++ be32b(0)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(i * 2) = ((samples(i) >> 8) & 0xff).toByte
      data(i * 2 + 1) = (samples(i) & 0xff).toByte
      i += 1
    }
    val comm = "COMM".getBytes("US-ASCII") ++ be32b(18) ++
      be16b(channels) ++ be32b(samples.length / channels) ++
      be16b(16) ++ ext
    val ssnd = "SSND".getBytes("US-ASCII") ++ be32b(8 + data.length) ++
      be32b(0) ++ be32b(0) ++ data
    val ssndPad = if (data.length % 2 == 1) ssnd :+ 0.toByte else ssnd
    val body = "AIFF".getBytes("US-ASCII") ++ comm ++ ssndPad
    "FORM".getBytes("US-ASCII") ++ be32b(body.length) ++ body
  }

  /** Render a 64-segment constant-amplitude envelope as n mono
    * samples: sample i takes amplitude env(⌊64·i/n⌋) with alternating
    * sign (a square-ish wave — |sample| is the envelope exactly, so
    * [[energyEnvelope]] recovers it bit-for-bit at ANY n ≥ 64, the
    * audio analog of [[PixelCodec.renderGridSized]]). */
  def renderEnvelope(env: Array[Long], n: Int): Array[Int] = {
    require(env.length == 64 && n >= 64)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val a = env((i.toLong * 64 / n).toInt).toInt
      out(i) = if (i % 2 == 0) a else -a
      i += 1
    }
    out
  }

  /** The fixture scene formula — md5-mixed segment amplitude, shared
    * verbatim by the Scala planting and (as hex-digit ascii
    * arithmetic) the DuckDB oracle: amp(scene, k) = 64 · first byte of
    * md5("a{scene}_{k}") — the ×64 headroom keeps the exact-gain
    * variant (×2) inside 16-bit range, and scaling never reorders
    * strict comparisons, so the oracle compares raw md5 bytes. The
    * "a" prefix keeps audio scenes independent of the image tier's
    * [[PixelCodec.sceneLuma]] space. */
  def segmentAmp(scene: Long, k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (md.digest(s"a${scene}_${k}".getBytes("UTF-8"))(0) & 0xff) * 64L
  }

  /** The full 64-segment scene envelope for a scene id. */
  def sceneEnvelope(scene: Long): Array[Long] =
    Array.tabulate(64)(segmentAmp(scene, _))
}
