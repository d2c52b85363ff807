package graft.sources

/** WARC (ISO 28500) web-archive parsing for the crawl-ingest tier —
  * the container format every large-scale web corpus arrives in
  * (Common Crawl ships ~1 GB `.warc.gz` shards). Plain and gzipped
  * files (the standard one-gzip-member-per-record layout — JDK
  * GZIPInputStream walks concatenated members); record grammar:
  * `WARC/1.x` version line, CRLF-terminated named headers,
  * `Content-Length` bytes of block, CRLF CRLF separator. `response`
  * records additionally parse their HTTP/1.x message (status line,
  * headers, payload).
  *
  * Hostile-input discipline matches the codec tier: a structural
  * violation anywhere (bad version line, missing Content-Length,
  * block past the buffer, truncated gzip member, malformed HTTP
  * status) returns None for the WHOLE file — at 100 TB the drop
  * granularity is the shard, and a shard that fails its container
  * grammar is re-fetched, not half-read. Parse is one linear walk,
  * no regex, no copies beyond the per-record payload slice.
  *
  * Scale note: files are the parallelism unit (binaryFile ingest →
  * per-partition parse); ~1 GB shards fit executor memory by design.
  * The per-record gzip members leave room for a future sub-file
  * splittable streaming reader behind this same record type.
  *
  * Reference provenance: the reference ingests fetched HTTP payloads
  * row-at-a-time (fetch_and_store_raw_games.py:60-103); the container
  * grammar is the public ISO 28500 / WARC 1.1 specification.
  */
object WarcCodec {

  /** One parsed record. For `response` records the HTTP message is
    * unwrapped: `httpStatus`, the payload's `contentType`, and `body`
    * = the HTTP payload. Other types carry status 0 and the raw
    * block. */
  final case class WarcRecord(
      recordId: String,
      warcType: String,
      targetUri: String,
      warcDate: String,
      httpStatus: Int,
      contentType: String,
      body: Array[Byte])

  def parseWarc(b: Array[Byte]): Option[Vector[WarcRecord]] =
    try {
      val raw =
        if (b.length >= 2 && (b(0) & 0xff) == 0x1f &&
            (b(1) & 0xff) == 0x8b) gunzipAll(b)
        else b
      parseRaw(raw)
    } catch { case _: Exception => None }

  /** Inflate ALL concatenated gzip members (the per-record layout). */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def parseRaw(b: Array[Byte]): Option[Vector[WarcRecord]] = {
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    var n = 0
    while (p < b.length) {
      // skip inter-record CRLF padding
      while (p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') p += 2
      if (p >= b.length) return someIf(out.result())
      val vEnd = lineEnd(b, p)
      if (vEnd < 0) return None
      val version = ascii(b, p, vEnd)
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      p = vEnd + 2
      // named headers until the empty line
      var typ = ""; var id = ""; var uri = ""; var date = ""
      var cType = ""; var cLen = -1L
      var open = true
      while (open) {
        val e = lineEnd(b, p)
        if (e < 0) return None
        if (e == p) { open = false; p += 2 }
        else {
          val line = ascii(b, p, e)
          val c = line.indexOf(':')
          if (c <= 0) return None
          val name = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          name match {
            case "warc-type" => typ = value
            case "warc-record-id" => id = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-type" => cType = value
            case "content-length" =>
              cLen = try value.toLong catch { case _: Exception => -1L }
            case _ => ()
          }
          p = e + 2
        }
      }
      if (typ.isEmpty || cLen < 0 || p + cLen > b.length) return None
      val block = java.util.Arrays.copyOfRange(b, p, (p + cLen).toInt)
      p = (p + cLen).toInt
      // the record terminator: exactly two CRLF, required even at EOF
      // (a record missing its terminator is a truncated shard)
      var crlf = 0
      while (crlf < 2 && p + 1 < b.length && b(p) == '\r' &&
          b(p + 1) == '\n') { crlf += 1; p += 2 }
      if (crlf < 2) return None
      n += 1
      if (n > 1000000) return None
      if (typ == "response" && cType.startsWith("application/http")) {
        parseHttp(block) match {
          case Some((status, payloadType, payload)) =>
            out += WarcRecord(id, typ, uri, date, status, payloadType,
              payload)
          case None => return None
        }
      } else out += WarcRecord(id, typ, uri, date, 0, cType, block)
    }
    someIf(out.result())
  }

  private def someIf(v: Vector[WarcRecord]): Option[Vector[WarcRecord]] =
    if (v.isEmpty) None else Some(v)

  /** HTTP/1.x response message → (status, content type, payload). */
  private def parseHttp(
      b: Array[Byte]): Option[(Int, String, Array[Byte])] = {
    val sEnd = lineEnd(b, 0)
    if (sEnd < 0) return None
    val statusLine = ascii(b, 0, sEnd)
    if (!statusLine.startsWith("HTTP/1.")) return None
    val parts = statusLine.split(" ")
    if (parts.length < 2) return None
    val status = try parts(1).toInt catch { case _: Exception => return None }
    if (status < 100 || status > 599) return None
    var p = sEnd + 2
    var cType = ""
    var open = true
    while (open) {
      val e = lineEnd(b, p)
      if (e < 0) return None
      if (e == p) { open = false; p += 2 }
      else {
        val line = ascii(b, p, e)
        val c = line.indexOf(':')
        if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase(
            "content-type"))
          cType = line.substring(c + 1).trim
        p = e + 2
      }
    }
    Some((status, cType, java.util.Arrays.copyOfRange(b, p, b.length)))
  }

  /** Index of the CR of the next CRLF at/after `from`; −1 when the
    * line never terminates (or a bare CR/LF violates the grammar). */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length) {
      if (b(i) == '\r')
        return if (i + 1 < b.length && b(i + 1) == '\n') i else -1
      if (b(i) == '\n') return -1
      i += 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, "US-ASCII")

  // ---- encoder (fixture side) ----

  /** One WARC record's bytes (uncompressed). */
  def encodeRecord(typ: String, id: String, uri: String, date: String,
      contentType: String, block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $typ\r\n")
    sb.append(s"WARC-Record-ID: $id\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
    if (contentType.nonEmpty) sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${block.length}\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(
      head.length + block.length + 4)
    out.write(head); out.write(block)
    out.write("\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** An HTTP response message wrapping `payload`. */
  def encodeHttpResponse(status: Int, reason: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(
      head.length + payload.length)
    out.write(head); out.write(payload)
    out.toByteArray
  }

  /** Concatenate records into a WARC file; `gzipped` wraps EACH
    * record in its own gzip member (the standard shard layout). */
  def encodeWarc(records: Seq[Array[Byte]],
      gzipped: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      if (gzipped) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(r); gz.finish()
      } else out.write(r)
    }
    out.toByteArray
  }
}
