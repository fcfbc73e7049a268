package graft.ops

/** EXIF / APP1 metadata walk + orientation semantics (r16 verdict missing
  * #5). JPEG decode correctly SKIPS APPn segments, but three curation
  * signals live inside APP1: Orientation (a correctness issue — patches
  * and pHashes computed on a rotated grid don't match their upright
  * twins), DateTime (corpus chronology), and the GPS IFD (a PII face: a
  * published training corpus must not carry capture coordinates).
  *
  * APP1 wraps a little TIFF file ("Exif\0\0" + byte-order header + IFD
  * chain) — the tag walk is the SAME IFD grammar [[TiffCodec]] decodes,
  * in either byte order (real camera firmware ships both). The audit
  * reads IFD0's Make/Orientation/DateTime and the GPS-IFD pointer
  * without touching entropy-coded image data; [[stripExif]] removes the
  * whole APP1 segment (the standard publish-time PII scrub — dropping
  * the segment is lossless for pixels).
  *
  * [[orientGrid]] applies the orientation as a pure grid PERMUTATION
  * (flips / transposes / quarter rotations are bijections — no resample,
  * no loss), so an orientation-corrected decode restores the upright
  * pixels EXACTLY and rotated companions pHash-match their base at
  * Hamming 0.
  *
  * Loud-failure contract: truncated segments, a bad TIFF magic, an
  * orientation outside 1..8, or an ASCII value overrunning the APP1
  * payload all throw. */
object ExifCodec {

  // ------------------------------------------------------------ orient

  /** EXIF orientation applied as a decoded-grid permutation: returns the
    * UPRIGHT (w', h', gray'). Values per the EXIF spec: 1 normal,
    * 2 mirror-H, 3 rotate 180, 4 mirror-V, 5 transpose, 6 rotate 90 CW,
    * 7 transverse, 8 rotate 270 CW. */
  def orientGrid(w: Int, h: Int, g: Array[Byte],
                 orientation: Int): (Int, Int, Array[Byte]) = {
    require(g.length == w * h, s"exif: grid ${g.length} != $w x $h")
    def make(w2: Int, h2: Int)(src: (Int, Int) => Int): (Int, Int, Array[Byte]) = {
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) { out(y * w2 + x) = g(src(x, y)); x += 1 }
        y += 1
      }
      (w2, h2, out)
    }
    orientation match {
      case 1 => (w, h, g)
      case 2 => make(w, h)((x, y) => y * w + (w - 1 - x))
      case 3 => make(w, h)((x, y) => (h - 1 - y) * w + (w - 1 - x))
      case 4 => make(w, h)((x, y) => (h - 1 - y) * w + x)
      case 5 => make(h, w)((x, y) => x * w + y)
      case 6 => make(h, w)((x, y) => (h - 1 - x) * w + y)
      case 7 => make(h, w)((x, y) => (h - 1 - x) * w + (w - 1 - y))
      case 8 => make(h, w)((x, y) => x * w + (w - 1 - y))
      case o => throw new IllegalArgumentException(s"exif: orientation $o not in 1..8")
    }
  }

  /** The orientation whose [[orientGrid]] inverts `o`'s (the quarter
    * rotations swap; everything else is self-inverse). */
  def inverseOrientation(o: Int): Int = o match {
    case 6 => 8
    case 8 => 6
    case x => x
  }

  // ------------------------------------------------------------ writer

  /** Serialize an APP1 Exif segment (FF E1, length, "Exif\0\0", TIFF
    * header in the chosen byte order, IFD0 with Make / Orientation /
    * DateTime and optionally a GPS IFD with latitude rationals). */
  def app1(orientation: Int, dateTime: String, make: String,
           gps: Boolean, bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"exif: orientation $orientation")
    require(dateTime.length == 19, "exif: DateTime must be 'YYYY:MM:DD HH:MM:SS'")
    val tiff = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (bigEndian) { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
      else { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit =
      if (bigEndian) { u16(((v >> 16) & 0xffff).toInt); u16((v & 0xffff).toInt) }
      else { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    val makeB = make.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val dtB = dateTime.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val n = if (gps) 4 else 3
    val ifd0Size = 2 + n * 12 + 4
    val extBase = 8 + ifd0Size
    val makeExternal = makeB.length > 4 // <= 4 bytes stores inline
    val makeOff = extBase
    val dtOff = extBase + (if (makeExternal) makeB.length else 0)
    val gpsOff = dtOff + dtB.length
    // header
    if (bigEndian) { tiff.write('M'); tiff.write('M') }
    else { tiff.write('I'); tiff.write('I') }
    u16(42); u32(8L)
    // IFD0 (ascending tags: 0x010F Make, 0x0112 Orientation, 0x0132
    // DateTime, 0x8825 GPS pointer)
    u16(n)
    def entry(tag: Int, tpe: Int, cnt: Long)(value: => Unit): Unit = {
      u16(tag); u16(tpe); u32(cnt); value
    }
    entry(0x010f, 2, makeB.length.toLong) {
      if (!makeExternal) { makeB.foreach(b => tiff.write(b & 0xff))
        (makeB.length until 4).foreach(_ => tiff.write(0)) }
      else u32(makeOff.toLong)
    }
    entry(0x0112, 3, 1L) { u16(orientation); u16(0) }
    entry(0x0132, 2, dtB.length.toLong) { u32(dtOff.toLong) }
    if (gps) entry(0x8825, 4, 1L) { u32(gpsOff.toLong) }
    u32(0L) // next IFD
    // external values
    if (makeExternal) makeB.foreach(b => tiff.write(b & 0xff))
    dtB.foreach(b => tiff.write(b & 0xff))
    if (gps) {
      val ratOff = gpsOff + 2 + 2 * 12 + 4
      u16(2)
      entry(1, 2, 2L) { tiff.write('N'); tiff.write(0); tiff.write(0); tiff.write(0) }
      entry(2, 5, 3L) { u32(ratOff.toLong) }
      u32(0L)
      // 47° 30' 1500/100" as unsigned rationals
      Seq((47L, 1L), (30L, 1L), (1500L, 100L)).foreach { case (nu, de) =>
        u32(nu); u32(de)
      }
    }
    val body = "Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 0) ++ tiff.toByteArray
    val len = body.length + 2
    require(len <= 0xffff, "exif: APP1 overflow")
    Array(0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ body
  }

  /** Splice an APP1 segment directly after SOI. */
  def insertApp1(jpeg: Array[Byte], seg: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF &&
      (jpeg(1) & 0xff) == 0xD8, "exif: not a JPEG (no SOI)")
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  // ------------------------------------------------------------ reader

  final case class ExifMeta(orientation: Int, dateTime: String, make: String,
                            hasGps: Boolean, byteOrder: String)

  /** Marker walk to the APP1 Exif segment; None when the file carries no
    * Exif APP1. Stops at SOS (Exif precedes entropy-coded data). */
  def scan(jpeg: Array[Byte]): Option[ExifMeta] = {
    var p = 2
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF &&
      (jpeg(1) & 0xff) == 0xD8, "exif: not a JPEG (no SOI)")
    while (p + 4 <= jpeg.length) {
      require((jpeg(p) & 0xff) == 0xFF, s"exif: expected marker at $p")
      val m = jpeg(p + 1) & 0xff
      if (m == 0xDA) return None // SOS: no Exif seen
      val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
      require(p + 2 + len <= jpeg.length, s"exif: segment overruns file at $p")
      if (m == 0xE1 && len >= 8 + 6 &&
          jpeg(p + 4) == 'E' && jpeg(p + 5) == 'x' && jpeg(p + 6) == 'i' &&
          jpeg(p + 7) == 'f' && jpeg(p + 8) == 0 && jpeg(p + 9) == 0)
        return Some(parseTiff(jpeg, p + 10, p + 2 + len))
      p += 2 + len
    }
    None
  }

  private def parseTiff(b: Array[Byte], t0: Int, end: Int): ExifMeta = {
    require(t0 + 8 <= end, "exif: truncated TIFF header")
    val be = (b(t0) & 0xff) == 'M'
    require((be && (b(t0 + 1) & 0xff) == 'M') ||
      (!be && (b(t0) & 0xff) == 'I' && (b(t0 + 1) & 0xff) == 'I'),
      "exif: bad TIFF byte order")
    def u16(off: Int): Int = {
      require(t0 + off + 2 <= end, s"exif: truncated at +$off")
      val a = b(t0 + off) & 0xff; val c = b(t0 + off + 1) & 0xff
      if (be) (a << 8) | c else a | (c << 8)
    }
    def u32(off: Int): Long = {
      require(t0 + off + 4 <= end, s"exif: truncated at +$off")
      if (be) (u16(off).toLong << 16) | u16(off + 2)
      else u16(off).toLong | (u16(off + 2).toLong << 16)
    }
    require(u16(2) == 42, "exif: bad TIFF magic")
    val ifd0 = u32(4).toInt
    val n = u16(ifd0)
    var orientation = 1
    var dateTime = ""
    var make = ""
    var hasGps = false
    def ascii(e: Int, cnt: Int): String = {
      val off = if (cnt <= 4) e + 8 else u32(e + 8).toInt
      require(t0 + off + cnt <= end, "exif: ASCII value overruns APP1")
      val raw = new String(b, t0 + off, cnt,
        java.nio.charset.StandardCharsets.US_ASCII)
      raw.takeWhile(_ != '\u0000')
    }
    (0 until n).foreach { k =>
      val e = ifd0 + 2 + 12 * k
      val tag = u16(e); val cnt = u32(e + 4).toInt
      tag match {
        case 0x0112 =>
          orientation = u16(e + 8)
          require(orientation >= 1 && orientation <= 8,
            s"exif: orientation $orientation out of range")
        case 0x0132 => dateTime = ascii(e, cnt)
        case 0x010f => make = ascii(e, cnt)
        case 0x8825 =>
          val gpsIfd = u32(e + 8).toInt
          hasGps = u16(gpsIfd) > 0 // a GPS IFD with entries
        case _ => () // unknown IFD0 tags: skipped by design
      }
    }
    ExifMeta(orientation, dateTime, make, hasGps, if (be) "MM" else "II")
  }

  /** Drop every APP1 Exif segment (publish-time PII scrub): marker walk
    * up to SOS, copy everything except Exif APP1s, then the rest
    * verbatim. Pixels and every other segment are untouched. */
  def stripExif(jpeg: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF &&
      (jpeg(1) & 0xff) == 0xD8, "exif: not a JPEG (no SOI)")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8)
    var p = 2
    var done = false
    while (!done && p + 4 <= jpeg.length) {
      require((jpeg(p) & 0xff) == 0xFF, s"exif: expected marker at $p")
      val m = jpeg(p + 1) & 0xff
      if (m == 0xDA) { // SOS: copy the rest verbatim
        out.write(jpeg, p, jpeg.length - p)
        done = true
      } else {
        val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
        require(p + 2 + len <= jpeg.length, s"exif: segment overruns file at $p")
        val isExif = m == 0xE1 && len >= 8 + 6 &&
          jpeg(p + 4) == 'E' && jpeg(p + 5) == 'x' && jpeg(p + 6) == 'i' &&
          jpeg(p + 7) == 'f' && jpeg(p + 8) == 0 && jpeg(p + 9) == 0
        if (!isExif) out.write(jpeg, p, 2 + len)
        p += 2 + len
      }
    }
    out.toByteArray
  }
}
