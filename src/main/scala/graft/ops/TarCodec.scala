package graft.ops

import java.nio.charset.StandardCharsets.ISO_8859_1

/** One parsed tar entry: POSIX name, typeflag ('0' regular, '5'
  * directory, …) and the entry data (empty for non-regular entries). */
final case class TarEntry(name: String, typeflag: Char, data: Array[Byte])

/** USTAR (POSIX.1-1988 tar) container walk — the OTHER shape bulk text
  * arrives in (dataset dumps ship as `.tar.gz`; [[GzipCodec]] provides
  * the outer member walk, this codec the inner one). 512-byte header
  * blocks with octal size fields and a spaces-substituted checksum,
  * data padded to block boundaries, two zero blocks as the terminator.
  *
  * Loud-failure contract (the gzip walk's stance): a wrong checksum, a
  * non-ustar magic, a malformed octal field, a size overrunning the
  * stream, a missing end-of-archive marker, or non-zero bytes after it
  * all throw — a reader that guesses through a corrupt archive silently
  * drops or truncates corpus files. */
object TarCodec {

  private val BlockSize = 512

  /** Serialize one entry (header block + zero-padded data blocks). */
  def entry(name: String, typeflag: Char, data: Array[Byte]): Array[Byte] = {
    require(name.length <= 100, s"tar: name too long (${name.length})")
    // a directory entry with data would silently drop it (size written 0,
    // no data blocks) — never-silently-drop, so reject at build time
    require(typeflag != '5' || data.isEmpty, "tar: directory entry cannot carry data")
    val hdr = new Array[Byte](BlockSize)
    def put(at: Int, s: String): Unit = {
      val bs = s.getBytes(ISO_8859_1)
      System.arraycopy(bs, 0, hdr, at, bs.length)
    }
    def putOctal(at: Int, width: Int, v: Long): Unit =
      put(at, ("%0" + (width - 1) + "o").format(v))
    put(0, name)
    putOctal(100, 8, 420)                  // mode 0644
    putOctal(108, 8, 0)                    // uid
    putOctal(116, 8, 0)                    // gid
    putOctal(124, 12, if (typeflag == '5') 0L else data.length.toLong)
    putOctal(136, 12, 1704067200L)         // mtime 2024-01-01
    hdr(156) = typeflag.toByte
    put(257, "ustar"); hdr(262) = 0        // magic
    put(263, "00")                         // version
    put(265, "graft"); put(297, "graft")   // uname/gname
    // checksum: field treated as 8 spaces, stored as 6 octal + NUL + space
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    hdr.foreach(b => sum += b & 0xff)
    put(148, "%06o".format(sum)); hdr(154) = 0; hdr(155) = ' '.toByte
    val padded = (data.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + (if (typeflag == '5') 0 else padded))
    System.arraycopy(hdr, 0, out, 0, BlockSize)
    if (typeflag != '5')
      System.arraycopy(data, 0, out, BlockSize, data.length)
    out
  }

  /** Serialize a whole archive: entries + the two-zero-block terminator. */
  def archive(entries: Seq[Array[Byte]]): Array[Byte] =
    entries.foldLeft(Array.emptyByteArray)(_ ++ _) ++
      new Array[Byte](2 * BlockSize)

  /** Parse ALL entries. Strict walk — see the object scaladoc. */
  def readEntries(bytes: Array[Byte]): Seq[TarEntry] = {
    require(bytes.length % BlockSize == 0 && bytes.length >= 2 * BlockSize,
      s"tar: stream is not whole blocks (${bytes.length} bytes)")
    val out = Seq.newBuilder[TarEntry]
    var pos = 0
    var ended = false
    while (!ended) {
      require(pos + BlockSize <= bytes.length, "tar: truncated archive")
      if ((pos until pos + BlockSize).forall(bytes(_) == 0)) {
        // end-of-archive: a second zero block, then only zero padding
        require(pos + 2 * BlockSize <= bytes.length &&
            (pos + BlockSize until pos + 2 * BlockSize).forall(bytes(_) == 0),
          "tar: missing second end-of-archive block")
        require((pos + 2 * BlockSize until bytes.length).forall(bytes(_) == 0),
          "tar: non-zero bytes after end-of-archive")
        ended = true
      } else {
        val hdr = java.util.Arrays.copyOfRange(bytes, pos, pos + BlockSize)
        val magic = new String(hdr, 257, 5, ISO_8859_1)
        require(magic == "ustar", s"tar: bad magic '$magic' at $pos")
        val stored = parseOctal(hdr, 148, 8, pos)
        java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
        var sum = 0L
        hdr.foreach(b => sum += b & 0xff)
        require(sum == stored,
          s"tar: header checksum mismatch at $pos ($sum != $stored)")
        val name = cString(hdr, 0, 100)
        val typeflag = (hdr(156) & 0xff).toChar
        val size = parseOctal(hdr, 124, 12, pos)
        require(size >= 0 && pos + BlockSize + size <= bytes.length,
          s"tar: entry '$name' size $size overruns the stream")
        val data =
          if (typeflag == '5') Array.emptyByteArray
          else java.util.Arrays.copyOfRange(
            bytes, pos + BlockSize, pos + BlockSize + size.toInt)
        out += TarEntry(name, typeflag, data)
        val padded = (size + BlockSize - 1) / BlockSize * BlockSize
        pos += BlockSize + (if (typeflag == '5') 0 else padded.toInt)
      }
    }
    out.result()
  }

  /** NUL-or-space-terminated octal field. */
  private def parseOctal(hdr: Array[Byte], at: Int, width: Int, pos: Int): Long = {
    var v = 0L
    var i = at
    var seen = false
    while (i < at + width && hdr(i) != 0 && hdr(i) != ' ') {
      val c = hdr(i) & 0xff
      require(c >= '0' && c <= '7',
        s"tar: malformed octal field at header $pos offset ${i - at}")
      v = v * 8 + (c - '0')
      seen = true
      i += 1
    }
    // leading spaces before digits are historical-tar legal; digits-then-
    // space-then-digits is not worth accepting — strict subset
    require(seen, s"tar: empty octal field in header at $pos")
    v
  }

  private def cString(hdr: Array[Byte], at: Int, width: Int): String = {
    var end = at
    while (end < at + width && hdr(end) != 0) end += 1
    new String(hdr, at, end - at, ISO_8859_1)
  }
}
