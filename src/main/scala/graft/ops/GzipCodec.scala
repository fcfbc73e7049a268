package graft.ops

/** GZIP ingestion — how 100 TB of crawl text actually arrives (WARC/WET
  * files are multi-member gzip). The CONTAINER walk (RFC 1952 member
  * headers with FEXTRA/FNAME/FCOMMENT/FHCRC, CRC32 + ISIZE trailers) is
  * ours; only the DEFLATE bitstream goes through `java.util.zip.Inflater`
  * (the JDK's zlib binding — platform-public and the production JVM
  * approach; hand-rolling DEFLATE would be slower and less trustworthy
  * than the battle-tested library). The contracts this codec pins:
  *
  *  - MULTI-MEMBER streams decode whole (a WARC is thousands of gzip
  *    members concatenated — a reader that stops at the first member
  *    silently truncates the corpus; the fixture plants two-member
  *    payloads to keep this tested);
  *  - EVERY byte must belong to a valid member: a corrupt later-member
  *    header throws instead of reading as EOF (GZIPInputStream's actual
  *    behavior — the silent-truncation mode this walk exists to close);
  *  - per-member CRC32 + ISIZE are checked; corruption throws, never a
  *    partial decode; non-gzip input fails on the magic check.
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

  /** Decode ALL members of a (possibly multi-member) gzip stream via our
    * OWN RFC 1952 container walk (header fields incl. FEXTRA/FNAME/
    * FCOMMENT/FHCRC skips, per-member CRC32 + ISIZE trailer checks) with
    * only the DEFLATE body through `Inflater`. The walk — not
    * GZIPInputStream — because the JDK stream SWALLOWS a corrupt
    * second-member header as EOF and silently returns a truncated corpus
    * (reproduced in the spec): every byte of the payload must be consumed
    * by a valid member or this throws. */
  def gunzip(payload: Array[Byte]): Array[Byte] = {
    def u16(p: Int) = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
    def u32(p: Int) = (u16(p).toLong | (u16(p + 2).toLong << 16)) & 0xffffffffL
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    require(payload.nonEmpty, "not a gzip payload")
    while (pos < payload.length) {
      require(pos + 10 <= payload.length, s"gzip: truncated member header at $pos")
      require((payload(pos) & 0xff) == 0x1f && (payload(pos + 1) & 0xff) == 0x8b,
        if (pos == 0) "not a gzip payload"
        else s"gzip: bad member header at $pos (trailing garbage or corrupt stream)")
      require((payload(pos + 2) & 0xff) == 8, "gzip: unknown compression method")
      val flg = payload(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        require(p + 2 <= payload.length, "gzip: truncated FEXTRA")
        p += 2 + u16(p)
      }
      def skipZeroTerminated(): Unit = {
        while (p < payload.length && payload(p) != 0) p += 1
        require(p < payload.length, "gzip: unterminated header string")
        p += 1
      }
      if ((flg & 0x08) != 0) skipZeroTerminated() // FNAME
      if ((flg & 0x10) != 0) skipZeroTerminated() // FCOMMENT
      if ((flg & 0x02) != 0) p += 2               // FHCRC
      require(p <= payload.length, "gzip: truncated member header")
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(payload, p, payload.length - p)
      val buf = new Array[Byte](8192)
      val crc = new java.util.zip.CRC32()
      var isize = 0L
      try {
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch {
              case e: java.util.zip.DataFormatException =>
                throw new IllegalArgumentException(s"gzip: corrupt deflate data: ${e.getMessage}")
            }
          if (n == 0 && inf.needsInput())
            throw new IllegalArgumentException("gzip: truncated deflate data")
          crc.update(buf, 0, n)
          out.write(buf, 0, n)
          isize += n
        }
        p += inf.getBytesRead.toInt
      } finally inf.end()
      require(p + 8 <= payload.length, "gzip: truncated member trailer")
      require(u32(p) == crc.getValue,
        s"gzip: CRC32 mismatch in member at $pos")
      require(u32(p + 4) == (isize & 0xffffffffL),
        s"gzip: ISIZE mismatch in member at $pos")
      pos = p + 8
    }
    out.toByteArray
  }
}
