package graft.ops

/** GZIP ingestion — how 100 TB of crawl text actually arrives (WARC/WET
  * files are multi-member gzip). The DEFLATE bitstream goes through
  * `java.util.zip` (the JDK's zlib binding — platform-public, and the
  * production JVM approach; hand-rolling DEFLATE would be slower and less
  * trustworthy than the battle-tested library), with the container
  * contracts this codec pins:
  *
  *  - MULTI-MEMBER streams decode whole (a WARC is thousands of gzip
  *    members concatenated — a reader that stops at the first member
  *    silently truncates the corpus; the fixture plants two-member
  *    payloads to keep this tested);
  *  - integrity is enforced (each member's CRC32 + ISIZE are checked by
  *    the stream; corruption throws — wrapped to this repo's loud
  *    IllegalArgumentException contract, never a partial decode);
  *  - non-gzip input fails on the magic check, not mid-stream.
  */
object GzipCodec {

  /** One gzip member of `bytes`. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.finish(); g.close()
    bos.toByteArray
  }

  /** Concatenated gzip members — the WARC shape. */
  def gzipMembers(parts: Seq[Array[Byte]]): Array[Byte] =
    parts.map(gzip).foldLeft(Array.emptyByteArray)(_ ++ _)

  /** Decode ALL members of a (possibly multi-member) gzip stream. Loud
    * failure on bad magic, bad CRC, or truncation. */
  def gunzip(payload: Array[Byte]): Array[Byte] = {
    require(payload.length >= 2 &&
      (payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b,
      "not a gzip payload")
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"gzip: corrupt stream: ${e.getMessage}")
    }
  }
}
