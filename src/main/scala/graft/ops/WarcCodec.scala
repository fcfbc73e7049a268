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
      body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason)
      .append(Crlf)
    sb.append("Content-Type: ").append(contentType).append(Crlf)
    sb.append("Content-Length: ").append(body.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes(ISO_8859_1) ++ body
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
    val body = java.util.Arrays.copyOfRange(payload, bodyAt, payload.length)
    headers.get("content-length").foreach { s =>
      require(s.toLong == body.length,
        s"http: Content-Length $s disagrees with body length ${body.length}")
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
