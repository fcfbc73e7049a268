package graft.ops

import java.nio.charset.StandardCharsets.ISO_8859_1

/** One parsed WARC record: the `WARC-Type`, the full (name-lowercased)
  * header map, and the raw content block. */
final case class WarcRecord(
    warcType: String,
    headers: Map[String, String],
    payload: Array[Byte])

/** WARC container walk (ISO 28500 / the public WARC 1.0-1.1 format — how
  * Common Crawl actually ships 100 TB of web text: `.warc.gz` files, one
  * gzip member per record, record-at-time compression so a reader can
  * split on member boundaries). This codec is the layer BETWEEN
  * [[GzipCodec]]'s member walk and the text pipeline:
  *
  *   gzip members → WARC records → HTTP responses → document text.
  *
  * Same loud-failure philosophy as the gzip walk — a crawl reader that
  * guesses through malformed records silently corrupts the corpus:
  *
  *  - the version line must be `WARC/1.0` or `WARC/1.1`;
  *  - every header line is `Name: value` terminated by CRLF (strict
  *    subset: no continuation lines), headers end at an empty line;
  *  - `WARC-Type` and `Content-Length` are mandatory, the length must
  *    parse and fit the remaining bytes;
  *  - each content block is followed by EXACTLY two CRLFs;
  *  - every byte of the stream must belong to a valid record (trailing
  *    garbage throws, like the gzip walk's every-byte-is-a-member rule).
  *
  * The HTTP side ([[httpResponse]]/[[httpResponseBody]]) handles the
  * `application/http` payload convention: response records carry a full
  * HTTP/1.1 message whose body is the document. Status-line shape,
  * header walk and (when present) `Content-Length` agreement are
  * enforced; only 200-status bodies are extractable — a reader that
  * ingests 404 pages poisons the corpus, so non-200 extraction throws
  * (callers filter on [[httpStatus]] first, the real pipeline rule). */
object WarcCodec {

  private val Crlf = "\r\n"

  /** Serialize one record. `Content-Length` and the record terminator are
    * appended here — callers supply only the semantic headers. */
  def record(
      warcType: String,
      recordId: String,
      extra: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: <urn:uuid:").append(recordId).append('>')
      .append(Crlf)
    sb.append("WARC-Date: 2024-01-01T00:00:00Z").append(Crlf)
    extra.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append(Crlf)
    }
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes(ISO_8859_1) ++ payload ++
      (Crlf + Crlf).getBytes(ISO_8859_1)
  }

  /** Parse ALL records of an (uncompressed) WARC stream. Strict walk —
    * see the object scaladoc for the failure contract. */
  def readRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    require(bytes.nonEmpty, "warc: empty stream")
    while (pos < bytes.length) {
      val (headers, bodyAt) = readHeaderBlock(bytes, pos)
      val warcType = headers.getOrElse("warc-type",
        throw new IllegalArgumentException(
          s"warc: record at $pos missing WARC-Type"))
      val lenL = headers.get("content-length") match {
        case Some(s) =>
          try s.toLong
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"warc: record at $pos has non-numeric Content-Length '$s'") }
        case None => throw new IllegalArgumentException(
          s"warc: record at $pos missing Content-Length")
      }
      // range-check as Long FIRST: a declared length past 2^31 must reject
      // here, not wrap to a bogus small int and mis-frame the record
      require(lenL >= 0 && lenL <= bytes.length.toLong - bodyAt,
        s"warc: record at $pos Content-Length $lenL overruns the stream")
      val len = lenL.toInt
      val payload = java.util.Arrays.copyOfRange(bytes, bodyAt, bodyAt + len)
      val termAt = bodyAt + len
      require(termAt + 4 <= bytes.length &&
          bytes(termAt) == '\r' && bytes(termAt + 1) == '\n' &&
          bytes(termAt + 2) == '\r' && bytes(termAt + 3) == '\n',
        s"warc: record at $pos not terminated by CRLFCRLF")
      out += WarcRecord(warcType, headers, payload)
      pos = termAt + 4
    }
    out.result()
  }

  /** Header block parse: version line + `Name: value` lines up to the
    * empty line. Returns (lowercased-name map, offset of the content
    * block). */
  private def readHeaderBlock(
      bytes: Array[Byte], start: Int): (Map[String, String], Int) = {
    var p = start
    def readLine(): String = {
      val at = p
      while (p + 1 < bytes.length && !(bytes(p) == '\r' && bytes(p + 1) == '\n'))
        p += 1
      require(p + 1 < bytes.length, s"warc: unterminated header line at $at")
      val s = new String(bytes, at, p - at, ISO_8859_1)
      p += 2
      s
    }
    val version = readLine()
    require(version == "WARC/1.0" || version == "WARC/1.1",
      s"warc: bad version line '$version' at $start")
    val hdrs = Map.newBuilder[String, String]
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"warc: malformed header line '$line' in record at $start")
      hdrs += line.substring(0, i).toLowerCase -> line.substring(i + 1).trim
      line = readLine()
    }
    (hdrs.result(), p)
  }

  /** Serialize one HTTP/1.1 response message (the `application/http;
    * msgtype=response` payload of a response record). */
  def httpResponse(
      status: Int, reason: String, contentType: String,
      body: Array[Byte]): Array[Byte] =
    httpResponseEncoded(status, reason, contentType, body,
      chunked = false, gzipped = false)

  /** Serialize one HTTP/1.1 response with the wire transports a real
    * crawl preserves: `gzipped` applies `Content-Encoding: gzip` to the
    * body; `chunked` frames the (possibly compressed) result as
    * `Transfer-Encoding: chunked` — content coding is applied BEFORE the
    * transfer coding, the RFC 9110/9112 layering, so a reader must
    * dechunk FIRST, then decompress. Chunked messages carry no
    * `Content-Length` (RFC 9112 §6.2 forbids the combination). */
  def httpResponseEncoded(
      status: Int, reason: String, contentType: String,
      body: Array[Byte], chunked: Boolean, gzipped: Boolean): Array[Byte] = {
    val content = if (gzipped) GzipCodec.gzip(body) else body
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason)
      .append(Crlf)
    sb.append("Content-Type: ").append(contentType).append(Crlf)
    if (gzipped) sb.append("Content-Encoding: gzip").append(Crlf)
    if (chunked) sb.append("Transfer-Encoding: chunked").append(Crlf)
    else sb.append("Content-Length: ").append(content.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes(ISO_8859_1) ++
      (if (chunked) chunkFrame(content) else content)
  }

  /** Chunked-transfer framing of a body (RFC 9112 §7.1): fixed 7-byte
    * chunks so multi-chunk framing — and chunk boundaries INSIDE
    * multi-byte character sequences — is guaranteed on any non-trivial
    * body; the first chunk carries a chunk extension and the last-chunk
    * line a trailer field, both of which a conforming reader must
    * tolerate and discard. */
  private[ops] def chunkFrame(content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(content.length + 64)
    var p = 0
    var first = true
    while (p < content.length) {
      val n = math.min(7, content.length - p)
      val ext = if (first) ";graft=1" else ""
      out.write((n.toHexString + ext + Crlf).getBytes(ISO_8859_1))
      out.write(content, p, n)
      out.write(Crlf.getBytes(ISO_8859_1))
      p += n
      first = false
    }
    out.write(("0" + Crlf + "X-Graft-Trailer: done" + Crlf + Crlf)
      .getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** Decode a `Transfer-Encoding: chunked` body (RFC 9112 §7.1): hex
    * chunk-size line (chunk extensions tolerated and discarded), chunk
    * data, CRLF, repeated to the `0` last-chunk, then an optional
    * trailer section ending at the empty line. Strict walk — a reader
    * that guesses through malformed chunk framing leaks the hex size
    * lines INTO the extracted text (the silent-poisoning class the
    * charset work eliminated), so every deviation throws:
    * non-hex size line, chunk data overrunning the stream, a chunk not
    * terminated by CRLF, a missing last-chunk, a malformed trailer, or
    * bytes after the terminating empty line. */
  def dechunk(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var p = 0
    def readLine(): String = {
      val at = p
      while (p + 1 < bytes.length &&
          !(bytes(p) == '\r' && bytes(p + 1) == '\n')) p += 1
      require(p + 1 < bytes.length,
        s"chunked: unterminated line at offset $at")
      val s = new String(bytes, at, p - at, ISO_8859_1)
      p += 2
      s
    }
    var done = false
    while (!done) {
      val sizeLine = readLine()
      // chunk extensions (`;name=value`) are discarded per RFC 9112 §7.1.1
      val sizeHex = sizeLine.indexOf(';') match {
        case -1 => sizeLine.trim
        case i => sizeLine.substring(0, i).trim
      }
      require(sizeHex.nonEmpty && sizeHex.forall(c =>
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F')),
        s"chunked: non-hex chunk-size line '$sizeLine'")
      require(sizeHex.length <= 7, // 28-bit cap: no real chunk is 256 MiB
        s"chunked: implausible chunk size '$sizeHex'")
      val n = java.lang.Integer.parseInt(sizeHex, 16)
      if (n == 0) done = true
      else {
        require(p + n + 2 <= bytes.length,
          s"chunked: chunk of $n bytes at $p overruns the stream")
        out.write(bytes, p, n)
        p += n
        require(bytes(p) == '\r' && bytes(p + 1) == '\n',
          s"chunked: chunk data at ${p - n} not terminated by CRLF")
        p += 2
      }
    }
    // trailer section: zero or more `Name: value` fields, then empty line
    var line = readLine()
    while (line.nonEmpty) {
      require(line.indexOf(':') > 0,
        s"chunked: malformed trailer field '$line'")
      line = readLine()
    }
    require(p == bytes.length,
      s"chunked: ${bytes.length - p} trailing bytes after last-chunk")
    out.toByteArray
  }

  /** Status code of an HTTP response message (status-line parse only —
    * the cheap pre-filter a crawl reader runs before body extraction). */
  def httpStatus(payload: Array[Byte]): Int = {
    val (status, _, _) = parseHttpHead(payload)
    status
  }

  /** Body bytes + Content-Type header of a 200-status HTTP response —
    * the pair the charset sniff needs ([[CharsetOps.decodeBody]] takes
    * the transport declaration alongside the bytes). Same strictness as
    * [[httpResponseBody]]. */
  def httpBodyAndContentType(
      payload: Array[Byte]): (Array[Byte], Option[String]) = {
    val (status, headers, bodyAt) = parseHttpHead(payload)
    require(status == 200,
      s"http: refusing body extraction from status $status (filter first)")
    val raw = java.util.Arrays.copyOfRange(payload, bodyAt, payload.length)
    // Transfer coding first (RFC 9112 §6.1): chunked framing wraps the
    // content-coded bytes on the wire, so decode order is dechunk →
    // decompress → (caller's charset sniff). A message carrying BOTH
    // Transfer-Encoding and Content-Length is the request-smuggling
    // ambiguity — reject it rather than pick a framing.
    val framed = headers.get("transfer-encoding") match {
      case Some(te) =>
        require(te.trim.equalsIgnoreCase("chunked"),
          s"http: unsupported Transfer-Encoding '$te'")
        require(!headers.contains("content-length"),
          "http: Transfer-Encoding with Content-Length (ambiguous framing)")
        dechunk(raw)
      case None =>
        headers.get("content-length").foreach { s =>
          require(s.toLong == raw.length,
            s"http: Content-Length $s disagrees with body length ${raw.length}")
        }
        raw
    }
    // Content coding second (RFC 9110 §8.4): the representation's own
    // compression. Unknown codings throw — passing gzip bytes to the
    // charset sniff mojibakes or poisons downstream dedup silently.
    val body = headers.get("content-encoding") match {
      case None => framed
      case Some(ce) => ce.trim.toLowerCase match {
        case "identity" | "" => framed
        case "gzip" | "x-gzip" => GzipCodec.gunzip(framed)
        case other => throw new IllegalArgumentException(
          s"http: unsupported Content-Encoding '$other'")
      }
    }
    (body, headers.get("content-type"))
  }

  /** Body bytes of a 200-status HTTP response. Non-200 throws (filter on
    * [[httpStatus]] first); a `Content-Length` header that disagrees with
    * the actual body length throws. */
  def httpResponseBody(payload: Array[Byte]): Array[Byte] =
    httpBodyAndContentType(payload)._1

  /** Parse the status line + header block of an HTTP response message.
    * Returns (status, lowercased headers, body offset). */
  private def parseHttpHead(
      payload: Array[Byte]): (Int, Map[String, String], Int) = {
    var p = 0
    def readLine(): String = {
      val at = p
      while (p + 1 < payload.length &&
          !(payload(p) == '\r' && payload(p + 1) == '\n')) p += 1
      require(p + 1 < payload.length, "http: unterminated header line")
      val s = new String(payload, at, p - at, ISO_8859_1)
      p += 2
      s
    }
    val statusLine = readLine()
    require(statusLine.startsWith("HTTP/1.0 ") ||
        statusLine.startsWith("HTTP/1.1 "),
      s"http: bad status line '$statusLine'")
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2, s"http: bad status line '$statusLine'")
    val status =
      try parts(1).toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"http: non-numeric status in '$statusLine'") }
    val hdrs = Map.newBuilder[String, String]
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"http: malformed header line '$line'")
      hdrs += line.substring(0, i).toLowerCase -> line.substring(i + 1).trim
      line = readLine()
    }
    (status, hdrs.result(), p)
  }
}
