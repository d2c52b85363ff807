package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcCodec
import graft.sources.WarcCodec.WarcRecord

/** The WARC (ISO 28500) crawl-container tier: record grammar round
  * trips in both compressions, multi-member gzip, HTTP response
  * unwrapping, non-response record passthrough, and the whole-file
  * hostile-input discipline (any structural violation → None). */
class WarcCodecSpec extends AnyFunSuite {

  private def resp(id: Int, status: Int = 200,
      body: String = "hello <b>world</b>"): Array[Byte] =
    WarcCodec.encodeRecord("response", f"<urn:uuid:doc-$id%08d>",
      s"https://example.org/doc/$id", "2026-01-01T00:00:00Z",
      "application/http;msgtype=response",
      WarcCodec.encodeHttpResponse(status, "OK",
        "text/html; charset=UTF-8", body.getBytes("UTF-8")))

  private def info(shard: Int): Array[Byte] =
    WarcCodec.encodeRecord("warcinfo", f"<urn:uuid:info-$shard%02d>",
      "", "2026-01-01T00:00:00Z", "application/warc-fields",
      "software: graft-fixture\r\n".getBytes("UTF-8"))

  test("plain and per-record-gzip round trips agree") {
    val recs = Seq(info(0), resp(1), resp(2, 404), resp(3))
    for (gz <- Seq(false, true)) {
      val parsed = WarcCodec.parseWarc(WarcCodec.encodeWarc(recs, gz))
      assert(parsed.isDefined, s"gz=$gz")
      val v = parsed.get
      assert(v.length === 4)
      assert(v(0).warcType === "warcinfo" && v(0).httpStatus === 0)
      assert(v(0).targetUri === "")
      assert(new String(v(0).body, "UTF-8") ===
        "software: graft-fixture\r\n")
      assert(v(1).warcType === "response" && v(1).httpStatus === 200)
      assert(v(1).recordId === "<urn:uuid:doc-00000001>")
      assert(v(1).targetUri === "https://example.org/doc/1")
      assert(v(1).contentType === "text/html; charset=UTF-8")
      assert(new String(v(1).body, "UTF-8") === "hello <b>world</b>")
      assert(v(2).httpStatus === 404)
    }
    // byte-identity across compressions (the decode seam, not bytes)
    val a = WarcCodec.parseWarc(WarcCodec.encodeWarc(recs, false)).get
    val b = WarcCodec.parseWarc(WarcCodec.encodeWarc(recs, true)).get
    a.zip(b).foreach { case (x, y) =>
      assert(x.copy(body = null) === y.copy(body = null))
      assert(x.body.toSeq === y.body.toSeq)
    }
  }

  test("request and metadata records pass through untyped") {
    val req = WarcCodec.encodeRecord("request", "<urn:uuid:req-1>",
      "https://example.org/doc/1", "2026-01-01T00:00:00Z",
      "application/http;msgtype=request",
      "GET /doc/1 HTTP/1.1\r\nHost: example.org\r\n\r\n"
        .getBytes("UTF-8"))
    val meta = WarcCodec.encodeRecord("metadata", "<urn:uuid:m-1>",
      "https://example.org/doc/1", "2026-01-01T00:00:00Z",
      "text/plain", "via: fixture".getBytes("UTF-8"))
    val v = WarcCodec.parseWarc(
      WarcCodec.encodeWarc(Seq(req, meta), gzipped = false)).get
    assert(v.map(_.warcType) === Vector("request", "metadata"))
    assert(v.forall(_.httpStatus === 0))
    assert(new String(v(0).body, "UTF-8").startsWith("GET /doc/1"))
  }

  test("UTF-8 bodies and empty payloads survive exactly") {
    val utf = "héllo wörld ünïcode — em—dash"
    val v = WarcCodec.parseWarc(WarcCodec.encodeWarc(
      Seq(resp(9, body = utf), resp(10, body = "")), false)).get
    assert(new String(v(0).body, "UTF-8") === utf)
    assert(v(1).body.length === 0)
  }

  test("hostile inputs return None and never throw") {
    val good = WarcCodec.encodeWarc(Seq(info(0), resp(1), resp(2)),
      gzipped = false)
    // truncation at every byte must fail the whole file (block
    // lengths or terminators break) — except prefixes that end
    // exactly at a record boundary, which are complete by grammar
    val boundaries = {
      val r0 = info(0).length
      val r1 = r0 + resp(1).length
      Set(r0, r1)
    }
    for (n <- 1 until good.length) {
      val p = WarcCodec.parseWarc(good.take(n))
      if (boundaries(n)) assert(p.isDefined, s"boundary@$n")
      else assert(p.isEmpty, s"truncated@$n")
    }
    assert(WarcCodec.parseWarc(Array.emptyByteArray).isEmpty)
    assert(WarcCodec.parseWarc("not a warc".getBytes).isEmpty)
    // bad version line
    val badV = good.clone(); badV(5) = '9'
    assert(WarcCodec.parseWarc(badV).isEmpty)
    // corrupt a Content-Length digit → block misaligns
    val clAt = new String(good, "ISO-8859-1").indexOf("Content-Length: ")
    val badCl = good.clone(); badCl(clAt + 16) = 'x'
    assert(WarcCodec.parseWarc(badCl).isEmpty)
    // bare LF line ending violates the grammar
    val lf = new String(good, "ISO-8859-1").indexOf('\r')
    val badEol = good.patch(lf, Nil, 1) // drop the CR
    assert(WarcCodec.parseWarc(badEol.toArray).isEmpty)
    // truncated gzip member
    val gz = WarcCodec.encodeWarc(Seq(resp(1)), gzipped = true)
    assert(WarcCodec.parseWarc(gz.take(gz.length - 6)).isEmpty)
    // malformed HTTP status in a response record
    val badHttp = WarcCodec.encodeRecord("response", "<urn:uuid:x>",
      "https://example.org/x", "2026-01-01T00:00:00Z",
      "application/http;msgtype=response",
      "HTTP/1.1 banana OK\r\n\r\n".getBytes("UTF-8"))
    assert(WarcCodec.parseWarc(
      WarcCodec.encodeWarc(Seq(badHttp), false)).isEmpty)
  }

  private def encResp(id: Int, body: String, gzipBody: Boolean,
      chunked: Boolean): Array[Byte] =
    WarcCodec.encodeRecord("response", f"<urn:uuid:doc-$id%08d>",
      s"https://example.org/doc/$id", "2026-01-01T00:00:00Z",
      "application/http;msgtype=response",
      WarcCodec.encodeHttpResponse(200, "OK",
        "text/html; charset=UTF-8", body.getBytes("UTF-8"),
        gzipBody = gzipBody, chunked = chunked))

  test("gzip / chunked / gzip-in-chunked bodies decode to the " +
      "identical representation") {
    val body = "x" * 257 + " <b>tail</b> é" // multi-chunk, non-ascii
    for {
      gz <- Seq(false, true)
      ch <- Seq(false, true)
      shardGz <- Seq(false, true)
    } {
      val v = WarcCodec.parseWarc(WarcCodec.encodeWarc(
        Seq(encResp(1, body, gz, ch)), gzipped = shardGz))
      assert(v.isDefined, s"gz=$gz ch=$ch shardGz=$shardGz")
      assert(new String(v.get.head.body, "UTF-8") === body,
        s"gz=$gz ch=$ch shardGz=$shardGz")
    }
  }

  test("chunked grammar: extensions and trailers are skipped, empty " +
      "bodies survive") {
    // the encoder writes ;chk=fixture on the first size line and an
    // X-Fixture-Trailer header — both must vanish from the payload
    val v = WarcCodec.parseWarc(WarcCodec.encodeWarc(
      Seq(encResp(1, "abc", gzipBody = false, chunked = true)), false)).get
    assert(new String(v.head.body, "UTF-8") === "abc")
    val empty = WarcCodec.parseWarc(WarcCodec.encodeWarc(
      Seq(encResp(2, "", gzipBody = false, chunked = true)), false)).get
    assert(empty.head.body.length === 0)
  }

  test("hostile delivery encodings return None") {
    def msg(httpBytes: Array[Byte]): Array[Byte] =
      WarcCodec.encodeWarc(Seq(WarcCodec.encodeRecord("response",
        "<urn:uuid:x>", "https://example.org/x", "2026-01-01T00:00:00Z",
        "application/http;msgtype=response", httpBytes)), false)
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n").getBytes("ISO-8859-1") ++ body
    // truncated gzip body
    val gzBody = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write("hello hello hello".getBytes("UTF-8")); g.finish()
      bo.toByteArray
    }
    assert(WarcCodec.parseWarc(msg(http(
      "Content-Encoding: gzip\r\n", gzBody.take(gzBody.length - 5)))).isEmpty)
    // garbage under a gzip claim
    assert(WarcCodec.parseWarc(msg(http(
      "Content-Encoding: gzip\r\n", "plainly not gzip".getBytes))).isEmpty)
    // unknown content coding
    assert(WarcCodec.parseWarc(msg(http(
      "Content-Encoding: br\r\n", "x".getBytes))).isEmpty)
    // malformed chunk size
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: chunked\r\n",
      "zz\r\nabc\r\n0\r\n\r\n".getBytes))).isEmpty)
    // chunk data missing its closing CRLF
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: chunked\r\n",
      "3\r\nabcXX0\r\n\r\n".getBytes))).isEmpty)
    // chunk running past the block
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: chunked\r\n",
      "ff\r\nshort\r\n0\r\n\r\n".getBytes))).isEmpty)
    // bytes after the terminating chunk
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: chunked\r\n",
      "3\r\nabc\r\n0\r\n\r\nextra".getBytes))).isEmpty)
    // missing last chunk entirely
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: chunked\r\n",
      "3\r\nabc\r\n".getBytes))).isEmpty)
    // unknown transfer coding
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: rot13\r\n", "x".getBytes))).isEmpty)
    // the valid layering still decodes (control for the above)
    assert(WarcCodec.parseWarc(msg(http(
      "Transfer-Encoding: chunked\r\n",
      "3\r\nabc\r\n0\r\n\r\n".getBytes))).flatMap(_.headOption)
      .exists(r => new String(r.body, "UTF-8") == "abc"))
  }

  test("deflate bodies decode in both wrap forms, strictly") {
    def msg(httpBytes: Array[Byte]): Array[Byte] =
      WarcCodec.encodeWarc(Seq(WarcCodec.encodeRecord("response",
        "<urn:uuid:x>", "https://example.org/x", "2026-01-01T00:00:00Z",
        "application/http;msgtype=response", httpBytes)), false)
    val body = "deflated <b>content</b> é" * 9
    for (raw <- Seq(false, true); ch <- Seq(false, true)) {
      val v = WarcCodec.parseWarc(msg(WarcCodec.encodeHttpResponse(
        200, "OK", "text/html", body.getBytes("UTF-8"),
        deflateBody = true, rawDeflate = raw, chunked = ch)))
      assert(v.isDefined, s"raw=$raw ch=$ch")
      assert(new String(v.get.head.body, "UTF-8") === body,
        s"raw=$raw ch=$ch")
    }
    // truncated (both wrap forms) and trailing-garbage bodies fail
    def http(body: Array[Byte]): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    for (raw <- Seq(false, true)) {
      val enc = WarcCodec.encodeHttpResponse(200, "OK", "text/html",
        body.getBytes("UTF-8"), deflateBody = true, rawDeflate = raw)
      val at = new String(enc, "ISO-8859-1").indexOf("\r\n\r\n") + 4
      val defl = enc.drop(at)
      assert(WarcCodec.parseWarc(msg(http(
        defl.take(defl.length - 4)))).isEmpty, s"truncated raw=$raw")
      assert(WarcCodec.parseWarc(msg(http(
        defl ++ "tail".getBytes))).isEmpty, s"trailing raw=$raw")
    }
    assert(WarcCodec.parseWarc(msg(http(
      "not deflate at all".getBytes))).isEmpty)
  }

  test("gzip member followed by trailing garbage fails the record") {
    // JDK GZIPInputStream would silently stop at the garbage; the
    // strict decoder must reject it — in the body layer AND the shard
    val gzBody = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write("hello".getBytes("UTF-8")); g.finish()
      bo.toByteArray
    }
    def msg(httpBytes: Array[Byte]): Array[Byte] =
      WarcCodec.encodeWarc(Seq(WarcCodec.encodeRecord("response",
        "<urn:uuid:x>", "https://example.org/x", "2026-01-01T00:00:00Z",
        "application/http;msgtype=response", httpBytes)), false)
    def http(body: Array[Byte]): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    assert(WarcCodec.parseWarc(msg(http(gzBody))).isDefined) // control
    assert(WarcCodec.parseWarc(msg(http(
      gzBody ++ "junk".getBytes))).isEmpty)
    // corrupt trailer CRC
    val badCrc = gzBody.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x7f).toByte
    assert(WarcCodec.parseWarc(msg(http(badCrc))).isEmpty)
    // shard layer: valid gzipped shard + trailing garbage → None
    val shard = WarcCodec.encodeWarc(Seq(resp(1)), gzipped = true)
    assert(WarcCodec.parseWarc(shard).isDefined)             // control
    assert(WarcCodec.parseWarc(shard ++ "garbage".getBytes).isEmpty)
  }

  test("oversized chunk sizes are rejected by the bounds guard") {
    def msg(httpBytes: Array[Byte]): Array[Byte] =
      WarcCodec.encodeWarc(Seq(WarcCodec.encodeRecord("response",
        "<urn:uuid:x>", "https://example.org/x", "2026-01-01T00:00:00Z",
        "application/http;msgtype=response", httpBytes)), false)
    def http(body: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n$body")
        .getBytes("ISO-8859-1")
    // 7fffffff would overflow an Int bounds check — must be None, not
    // an accidental downstream IndexOutOfBounds
    assert(WarcCodec.parseWarc(msg(http("7fffffff\r\nx\r\n0\r\n\r\n")))
      .isEmpty)
    assert(WarcCodec.parseWarc(msg(http("ffffffff\r\nx\r\n0\r\n\r\n")))
      .isEmpty)
    assert(WarcCodec.parseWarc(msg(http("123456789\r\nx\r\n0\r\n\r\n")))
      .isEmpty) // > 8 hex digits
  }

  test("multi-member gzip concatenation parses every member") {
    val many = (0 until 40).map(i => resp(i, body = s"doc $i body"))
    val v = WarcCodec.parseWarc(
      WarcCodec.encodeWarc(many, gzipped = true)).get
    assert(v.length === 40)
    assert(v.zipWithIndex.forall { case (r, i) =>
      new String(r.body, "UTF-8") === s"doc $i body"
    })
  }
}
