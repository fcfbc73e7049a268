package graft.ops

/** Netpbm codec (P5 binary PGM grayscale / P6 binary PPM RGB — the
  * no-compression interchange format scientific pipelines still dump):
  * ASCII header (magic, whitespace-separated width/height/maxval with
  * `#` comments legal anywhere whitespace is), single whitespace byte,
  * then raw samples. Both 8-bit (maxval ≤ 255) and 16-bit big-endian
  * (maxval ≤ 65535) sample widths.
  *
  * Loud-failure contract: bad magic, malformed/missing header fields,
  * maxval 0 or > 65535, truncated sample data, or trailing bytes all
  * throw. */
object PnmCodec {

  /** Encode grayscale (P5). 16-bit big-endian when maxval > 255. */
  def encodeGray(w: Int, h: Int, maxval: Int, vs: Array[Int],
                 comment: Boolean = false): Array[Byte] =
    encode("P5", w, h, maxval, vs, 1, comment)

  /** Encode RGB (P6), `vs` interleaved r,g,b. */
  def encodeRgb(w: Int, h: Int, maxval: Int, vs: Array[Int],
                comment: Boolean = false): Array[Byte] =
    encode("P6", w, h, maxval, vs, 3, comment)

  private def encode(magic: String, w: Int, h: Int, maxval: Int,
                     vs: Array[Int], ch: Int, comment: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && maxval > 0 && maxval <= 65535, "pnm: bad header")
    require(vs.length == w * h * ch, "pnm: sample count mismatch")
    require(vs.forall(v => v >= 0 && v <= maxval), "pnm: sample out of range")
    val out = new java.io.ByteArrayOutputStream()
    val hdr = new StringBuilder(magic).append('\n')
    if (comment) hdr.append("# graft fixture\n")
    hdr.append(w).append(' ').append(h).append('\n').append(maxval).append('\n')
    out.write(hdr.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      0, hdr.length)
    if (maxval > 255) vs.foreach { v => out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    else vs.foreach(v => out.write(v & 0xff))
    out.toByteArray
  }

  /** Decode either form. Returns (width, height, channels, maxval,
    * samples interleaved). */
  def decode(payload: Array[Byte]): (Int, Int, Int, Int, Array[Int]) = {
    require(payload.length >= 2, "pnm: truncated stream")
    val magic = new String(payload, 0, 2,
      java.nio.charset.StandardCharsets.US_ASCII)
    val ch = magic match {
      case "P5" => 1
      case "P6" => 3
      case m => throw new IllegalArgumentException(s"not a binary PNM payload ('$m')")
    }
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // one header int: skip whitespace and #-comments, then digits
    def readInt(): Int = {
      var skipping = true
      while (skipping) {
        require(pos < payload.length, "pnm: truncated header")
        if (isWs(payload(pos))) pos += 1
        else if (payload(pos) == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else skipping = false
      }
      var v = 0L
      var seen = false
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0')
        require(v <= Int.MaxValue, "pnm: header field overflow")
        seen = true
        pos += 1
      }
      require(seen, s"pnm: expected header integer at $pos")
      v.toInt
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(w > 0 && h > 0, "pnm: bad dimensions")
    require(maxval > 0 && maxval <= 65535, s"pnm: bad maxval $maxval")
    require(pos < payload.length && isWs(payload(pos)),
      "pnm: missing single whitespace before samples")
    pos += 1 // EXACTLY one whitespace byte, per the spec
    // Long arithmetic: a crafted 65536×65536 header must not wrap w*h*ch
    // past the length check and silently "decode" an empty image
    val nL = w.toLong * h * ch
    val wide = maxval > 255
    val needL = nL * (if (wide) 2 else 1)
    require(pos + needL == payload.length,
      s"pnm: sample section is ${payload.length - pos} bytes, expected $needL")
    val n = nL.toInt
    val vs = new Array[Int](n)
    var i = 0
    while (i < n) {
      vs(i) =
        if (wide) ((payload(pos + 2 * i) & 0xff) << 8) | (payload(pos + 2 * i + 1) & 0xff)
        else payload(pos + i) & 0xff
      require(vs(i) <= maxval, s"pnm: sample ${vs(i)} exceeds maxval $maxval")
      i += 1
    }
    (w, h, ch, maxval, vs)
  }
}
