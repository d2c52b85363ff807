package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pixel-level image codec for the perceptual-hash tier — REAL decode
  * with no codec library: grayscale 8-bit PNG rides the JDK's zlib
  * (`Inflater`) plus hand-reversed scanline filters (all five PNG
  * filter types: None/Sub/Up/Average/Paeth, RFC 2083 §6), and 24-bit
  * uncompressed BMP is plain byte arithmetic. That covers the decode
  * side a perceptual near-dup needs (re-encoded, resized, format-
  * converted, metadata-stripped variants of one image all reach the
  * same pixels); JPEG's DCT tier stays behind the open codec seam
  * ([[Multimodal.MediaDecoder]]) like audio/video sample decode.
  *
  * Everything is deterministic integer arithmetic — decode, the 8×8
  * box-average downsample, and the 64-bit dHash — so the DuckDB oracle
  * can recompute expected hashes from the fixture-planting formula and
  * the whole pipeline is hash-checked end to end (reference analog: the
  * opaque media blobs of backfill_user_profiles.py, which the reference
  * never dedups perceptually — this closes that gap Spark-first).
  *
  * Hostile-input discipline matches [[Multimodal.HeaderDecoder]]:
  * decode never throws — truncated chunks, corrupt deflate streams,
  * undersized pixel buffers, or unsupported color modes return None.
  */
object PixelCodec {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** A decoded grayscale image: luma (0–255) row-major. */
  case class Gray(width: Int, height: Int, luma: Array[Int])

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decode an 8-bit grayscale (color type 0), non-interlaced PNG.
    * Walks the chunk stream, concatenates IDAT payloads, inflates, and
    * reverses the per-scanline filter. Ancillary chunks (tEXt etc.) are
    * skipped, so metadata-stripped/annotated re-encodes decode to the
    * same pixels. Returns None for any other color mode (RGB/palette/
    * 16-bit/interlaced — the open seam) or malformed input. */
  def decodeGray8Png(b: Array[Byte]): Option[Gray] = {
    if (b.length < 45 || !b.take(8).sameElements(PngSig)) return None
    var p = 8
    var w = 0; var h = 0; var ok = false
    val idat = new java.io.ByteArrayOutputStream()
    while (p + 8 <= b.length) {
      val len = be32(b, p)
      if (len < 0 || p + 12 + len > b.length) return None
      val typ = new String(b, p + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(b, p + 8); h = be32(b, p + 12)
          // bit depth 8, color 0 (gray), deflate, adaptive, no interlace
          if (u8(b, p + 16) != 8 || u8(b, p + 17) != 0 ||
              u8(b, p + 18) != 0 || u8(b, p + 19) != 0 ||
              u8(b, p + 20) != 0) return None
        case "IDAT" => idat.write(b, p + 8, len)
        case "IEND" => ok = true
        case _ => () // ancillary chunk: skip
      }
      p += 12 + len
    }
    if (!ok || w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val raw = inflate(idat.toByteArray, (w + 1) * h).getOrElse(return None)
    if (raw.length < (w + 1) * h) return None
    // reverse scanline filters; bpp = 1 for gray8, so "pixel to the
    // left" is one byte back and Paeth's c is the up-left byte
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowOff = y * (w + 1)
      val filter = u8(raw, rowOff)
      if (filter > 4) return None
      var x = 0
      while (x < w) {
        val cur = u8(raw, rowOff + 1 + x)
        val a = if (x > 0) px(y * w + x - 1) else 0            // left
        val bb = if (y > 0) px((y - 1) * w + x) else 0         // up
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) else 0 // up-left
        val v = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + bb
          case 3 => cur + (a + bb) / 2
          case 4 => cur + paeth(a, bb, c)
        }
        px(y * w + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    Some(Gray(w, h, px))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(z: Array[Byte], expect: Int): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(z)
      val out = new Array[Byte](expect)
      var off = 0
      while (off < expect && !inf.finished()) {
        val n = inf.inflate(out, off, expect - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off == expect) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Decode a 24-bit uncompressed bottom-up BMP (BITMAPINFOHEADER) to
    * luma = the green channel (fixtures write R=G=B, so any channel is
    * the luma; a real pipeline would mix — the formula is one line). */
  def decodeBmp24(b: Array[Byte]): Option[Gray] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    if (le32(b, 14) < 40) return None             // header size
    val w = le32(b, 18); val h = le32(b, 22)
    if (le16(b, 26) != 1 || le16(b, 28) != 24 || le32(b, 30) != 0)
      return None                                  // planes/bpp/compression
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
      return None
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowOff = dataOff + (h - 1 - y) * stride  // bottom-up rows
      var x = 0
      while (x < w) {
        px(y * w + x) = u8(b, rowOff + x * 3 + 1)  // BGR: +1 = green
        x += 1
      }
      y += 1
    }
    Some(Gray(w, h, px))
  }

  /** Pixel decode across the supported formats. */
  def decodePixels(b: Array[Byte]): Option[Gray] =
    decodeGray8Png(b).orElse(decodeBmp24(b))

  /** Box-average downsample to an 8×8 luma grid (row-major, 64 ints).
    * Exact integer floor averaging per tile; requires dimensions
    * divisible by 8 so tiles partition the image (non-conforming sizes
    * return None — at scale those route through a real resampler behind
    * the codec seam; the floor keeps the result deterministic for the
    * oracle either way). */
  def lumaGrid8(g: Gray): Option[Array[Int]] = {
    if (g.width <= 0 || g.height <= 0 ||
        g.width % 8 != 0 || g.height % 8 != 0) return None
    val tw = g.width / 8; val th = g.height / 8
    val out = new Array[Int](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var sum = 0L
        var y = by * th
        while (y < (by + 1) * th) {
          var x = bx * tw
          while (x < (bx + 1) * tw) { sum += g.luma(y * g.width + x); x += 1 }
          y += 1
        }
        out(by * 8 + bx) = (sum / (tw.toLong * th)).toInt
        bx += 1
      }
      by += 1
    }
    Some(out)
  }

  /** 64-bit dHash over the 8×8 grid: bit (by·8+bx) is set when the
    * right neighbor (wrapping bx 7→0, so 8 gradients per row — the
    * 9×8-grid classic without a non-divisor 9th column) is strictly
    * brighter. Gradient signs survive brightness/contrast shifts; byte
    * identity does not — which is exactly the near-dup signal. */
  def dhash64(grid: Array[Int]): Long = {
    require(grid.length == 64, "dhash64 expects an 8x8 grid")
    var h = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        if (grid(by * 8 + (bx + 1) % 8) > grid(by * 8 + bx))
          h |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    h
  }

  /** Payload → perceptual hash in one step (None = not a supported
    * pixel format or non-÷8 dimensions). */
  def phash(payload: Array[Byte]): Option[Long] =
    decodePixels(payload).flatMap(lumaGrid8).map(dhash64)

  // ---- encoders (fixture planting + spec round-trips) ----

  private def be32b(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val td = typ.getBytes("US-ASCII") ++ data
    val crc = new CRC32; crc.update(td)
    be32b(data.length) ++ td ++ be32b(crc.getValue.toInt)
  }

  /** Encode an 8-bit grayscale PNG. `filterType` picks the scanline
    * filter applied to EVERY row (0–4) — same pixels, different bytes,
    * which is what a re-encode does. `textChunk` plants an ancillary
    * tEXt chunk (metadata a stripper would remove). */
  def encodeGray8Png(g: Gray, filterType: Int = 0,
      textChunk: Option[String] = None): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4, "PNG filter type 0-4")
    val w = g.width; val h = g.height
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = filterType.toByte
      var x = 0
      while (x < w) {
        val cur = g.luma(y * w + x)
        val a = if (x > 0) g.luma(y * w + x - 1) else 0
        val b = if (y > 0) g.luma((y - 1) * w + x) else 0
        val c = if (x > 0 && y > 0) g.luma((y - 1) * w + x - 1) else 0
        val f = filterType match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (w + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) zOut.write(buf, 0, def_.deflate(buf))
    def_.end()
    val ihdr = chunk("IHDR",
      be32b(w) ++ be32b(h) ++ Array[Byte](8, 0, 0, 0, 0))
    val text = textChunk.map(t =>
      chunk("tEXt", ("Comment " + t).getBytes("US-ASCII")))
      .getOrElse(Array.emptyByteArray)
    PngSig ++ ihdr ++ text ++ chunk("IDAT", zOut.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)

  /** Encode a 24-bit bottom-up BMP with R=G=B=luma (the format-
    * conversion variant of the same image). */
  def encodeBmp24(g: Gray): Array[Byte] = {
    val w = g.width; val h = g.height
    val stride = ((w * 3 + 3) / 4) * 4
    val dataLen = stride * h
    val out = new java.io.ByteArrayOutputStream(54 + dataLen)
    out.write("BM".getBytes("US-ASCII"))
    out.write(le32b(54 + dataLen)); out.write(le32b(0)); out.write(le32b(54))
    out.write(le32b(40)); out.write(le32b(w)); out.write(le32b(h))
    out.write(le16b(1)); out.write(le16b(24)); out.write(le32b(0))
    out.write(le32b(dataLen))
    out.write(le32b(2835)); out.write(le32b(2835))  // 72 dpi
    out.write(le32b(0)); out.write(le32b(0))
    val row = new Array[Byte](stride)
    var y = h - 1
    while (y >= 0) {                                 // bottom-up
      java.util.Arrays.fill(row, 0.toByte)
      var x = 0
      while (x < w) {
        val l = g.luma(y * w + x).toByte
        row(x * 3) = l; row(x * 3 + 1) = l; row(x * 3 + 2) = l
        x += 1
      }
      out.write(row)
      y -= 1
    }
    out.toByteArray
  }

  /** Render an 8×8 block grid at `size`×`size` pixels (size ÷ 8): each
    * grid cell paints a constant tile, so box-averaging ANY rendering
    * back to 8×8 recovers the grid exactly — the property that makes
    * resized fixture variants hash-identical and the oracle exact. */
  def renderGrid(grid: Array[Int], size: Int): Gray = {
    require(grid.length == 64 && size % 8 == 0 && size > 0)
    val t = size / 8
    val px = new Array[Int](size * size)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) { px(y * size + x) = grid((y / t) * 8 + x / t); x += 1 }
      y += 1
    }
    Gray(size, size, px)
  }

  /** The fixture scene formula — md5-mixed block luma, shared verbatim
    * by the Scala planting and (as hex-digit ascii arithmetic) the
    * DuckDB oracle: luma(scene, bx, by) = first byte of
    * md5("{scene}_{bx}_{by}"). md5 mixing makes distinct scenes
    * near-orthogonal in dHash space (expected Hamming distance 32),
    * so banding never accidentally links two scenes. */
  def sceneLuma(scene: Long, bx: Int, by: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"${scene}_${bx}_${by}".getBytes("UTF-8"))(0) & 0xff
  }

  /** The full 8×8 scene grid for a scene id. */
  def sceneGrid(scene: Long): Array[Int] = {
    val g = new Array[Int](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) { g(by * 8 + bx) = sceneLuma(scene, bx, by); bx += 1 }
      by += 1
    }
    g
  }
}
