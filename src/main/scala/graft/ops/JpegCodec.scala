package graft.ops

/** REAL JPEG codec (ITU-T T.81: sequential baseline SOF0 + progressive
  * SOF2 grayscale), pure JVM — the last `FakeDecoder` image family
  * promoted to a genuine
  * parser: SOI/DQT/SOF0/DHT/SOS/EOI marker walk, canonical Huffman tables
  * (the public Annex-K luminance tables, read back FROM the DHT segment —
  * the decoder trusts the stream, not compiled-in constants), DC DPCM with
  * category coding, AC run-length with ZRL/EOB, 0xFF byte stuffing,
  * zigzag coefficient order, and RESTART MARKERS (DRI + RSTn every N
  * MCUs: byte-aligned markers between MCU groups, DC predictors reset —
  * the error-resilience/parallel-decode structure real camera files
  * carry; restart is entropy TRANSPORT only, decoded pixels are
  * bit-identical with or without it).
  *
  * The transform stage is this repo's INTEGER-EXACT chain (not libjpeg's
  * float or its scaled-integer AAN): with C = round(cos((2i+1)uπ/16)·2^10)
  * (the [[MultimodalOps.PhashDct]] table) and A(u) = round(α(u)·2^10)
  * (724 for u=0 else 1024),
  *
  *   Fraw[u][v] = Σ_{i,j} (px−128)·C[u][i]·C[v][j]
  *   qc[u][v]   = truncDiv(Fraw·A[u]·A[v] + 2^41, 2^42)      (quant table 1)
  *   s'[i][j]   = truncDiv(Σ_{u,v} qc·A[u]·A[v]·C[u][i]·C[v][j] + 2^41, 2^42)
  *   px'        = clamp(s' + 128, 0, 255)
  *
  * — numerically the standard normalized DCT-II/IDCT pair, but every step
  * is int64 arithmetic, so decode(encode(img)) is bit-replayable by the
  * DuckDB oracle from the pixel tiling alone (JPEG is lossy; DETERMINISM,
  * not losslessness, is what the gate needs). The entropy layer transports
  * qc exactly, so the bitstream is a real JPEG whose only codec-specific
  * choice is the (legal) quantization table of all ones. */
object JpegCodec {

  private val Dct = MultimodalOps.PhashDct // C[u][i] = round(cos·1024)
  private val Alpha: Array[Long] = Array(724L, 1024L, 1024L, 1024L, 1024L, 1024L, 1024L, 1024L)
  private val Shift = 42 // divide by 4·1024^4 = 2^42, rounding half up
  private val Half = 1L << 41

  /** Standard zigzag scan order: Zigzag(k) = row-major index of the k-th
    * coefficient in scan order. */
  val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var k = 0
    for (s <- 0 until 15; i <- 0 to s if s - i <= 7 && i <= 7) {
      val (r, c) = if (s % 2 == 0) (s - i, i) else (i, s - i)
      z(k) = r * 8 + c
      k += 1
    }
    z
  }

  /** Annex-K luminance DC table: (code counts per length 1..16, symbols). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray
  /** Annex-K luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA).map(_.toByte)

  /** Canonical JPEG code assignment: symbols in table order get increasing
    * codes, code length per the counts array. Returns symbol → (code, len). */
  private def canonical(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = 0
      while (n < bits(len - 1)) {
        out(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; n += 1
      }
      code <<= 1
    }
    out.toMap
  }

  // ----------------------------------------------------------- transform

  /** Rounding division: add half, then TRUNCATING division — Java's `/`,
    * which is exactly DuckDB's integer `//` (both truncate toward zero;
    * floorDiv would diverge from the oracle on negative coefficients). */
  private def rdiv(x: Long): Long = (x + Half) / (1L << Shift)

  /** Forward integer DCT + quantization (table of ones) of one 8×8 block of
    * level-shifted samples; row-major in, row-major out. */
  def forwardBlock(s: Array[Int]): Array[Long] = {
    // separable: tmp[i][v] = Σ_j s·C[v][j]; Fraw[u][v] = Σ_i C[u][i]·tmp
    val tmp = new Array[Long](64)
    var i = 0
    while (i < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L; var j = 0
        while (j < 8) { acc += s(i * 8 + j).toLong * Dct(v)(j); j += 1 }
        tmp(i * 8 + v) = acc; v += 1
      }
      i += 1
    }
    val q = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L; var k = 0
        while (k < 8) { acc += Dct(u)(k) * tmp(k * 8 + v); k += 1 }
        q(u * 8 + v) = rdiv(acc * Alpha(u) * Alpha(v))
        v += 1
      }
      u += 1
    }
    q
  }

  /** Inverse: quantized coefficients (row-major) → clamped samples. */
  def inverseBlock(q: Array[Long]): Array[Int] = {
    // tmp[u][j] = Σ_v qc·A[v]·C[v][j]; s[i][j] = rdiv(Σ_u A[u]·C[u][i]·tmp)
    // — NOT separable with the single final rounding above, so do the
    // direct double sum to match the spec'd one-rounding formula exactly
    val out = new Array[Int](64)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0L
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            acc += q(u * 8 + v) * Alpha(u) * Alpha(v) * Dct(u)(i) * Dct(v)(j)
            v += 1
          }
          u += 1
        }
        val s = rdiv(acc) + 128
        out(i * 8 + j) = if (s < 0) 0 else if (s > 255) 255 else s.toInt
        j += 1
      }
      i += 1
    }
    out
  }

  // ----------------------------------------------------------- bit I/O

  private final class BitWriter(buf: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) {
        acc = (acc << 1) | ((code >> k) & 1); n += 1
        if (n == 8) {
          buf.write(acc)
          if (acc == 0xff) buf.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        k -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per spec
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      buf.write(acc)
      if (acc == 0xff) buf.write(0x00)
      acc = 0; n = 0
    }
    /** Byte-align (1-padded) and emit RSTm — the restart marker between
      * MCU groups (T.81 §B.2.3.7; markers sit OUTSIDE the stuffed entropy
      * bytes, which is why the pad byte above still stuffs but the marker
      * itself never does). */
    def restart(m: Int): Unit = {
      flush()
      buf.write(0xff); buf.write(0xD0 + (m & 7))
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < data.length, "JPEG: entropy stream truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < data.length && data(pos) == 0x00,
            "JPEG: unstuffed 0xFF inside entropy data")
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = { var v = 0; var i = 0; while (i < k) { v = (v << 1) | bit(); i += 1 }; v }
    /** Consume an expected RSTm at an MCU-group boundary: drop the pad
      * bits of the current byte (already fetched — the byte holding the
      * last code bit carries them), then the two marker bytes must follow
      * verbatim. A wrong or missing restart marker fails loudly instead of
      * silently decoding the next group against stale DC predictors. */
    def resync(m: Int): Unit = {
      n = 0; acc = 0
      require(pos + 2 <= data.length &&
        (data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xff) == (0xD0 + (m & 7)),
        s"JPEG: expected RST${m & 7} restart marker at $pos")
      pos += 2
    }
  }

  private def category(v: Long): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  // ----------------------------------------------------------- encode

  /** Encode row-major 8-bit grayscale as a baseline JPEG. Dims must be
    * multiples of 8 (the fixture guarantees it; general edge replication
    * is orthogonal to the codec semantics under test). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
                 restartInterval: Int = 0): Array[Byte] =
    encodePlanes(w, h, Array(gray), restartInterval)

  /** Encode row-major RGB triples as a baseline YCbCr 4:4:4 COLOR JPEG
    * (3 interleaved components, shared quant/Huffman table 0 — legal and
    * what keeps the oracle replay single-tabled). Color conversion is the
    * standard JFIF matrix in integer-exact form (scaled coefficients,
    * add-half + truncating division — the DuckDB `//` semantics):
    *   Y  = (299R + 587G + 114B + 500) / 1000
    *   Cb = (−1687R − 3313G + 5000B + 5000) / 10000 + 128
    *   Cr = (5000R − 4187G − 813B + 5000) / 10000 + 128, clamped. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte],
                restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val y = new Array[Byte](w * h)
    val cb = new Array[Byte](w * h)
    val cr = new Array[Byte](w * h)
    var p = 0
    while (p < w * h) {
      val r = rgb(3 * p) & 0xff; val g = rgb(3 * p + 1) & 0xff; val b = rgb(3 * p + 2) & 0xff
      y(p) = clamp255((299L * r + 587L * g + 114L * b + 500L) / 1000L)
      cb(p) = clamp255((-1687L * r - 3313L * g + 5000L * b + 5000L) / 10000L + 128L)
      cr(p) = clamp255((5000L * r - 4187L * g - 813L * b + 5000L) / 10000L + 128L)
      p += 1
    }
    encodePlanes(w, h, Array(y, cb, cr), restartInterval)
  }

  private def clamp255(v: Long): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Entropy-code one quantized block: DC DPCM + category coding, AC
    * run-length with ZRL/EOB — per T.81 scan rules. Returns the new DC
    * predictor (this block's DC). */
  private def writeBlock(bw: BitWriter, q: Array[Long], prev: Long,
                         dcCode: Map[Int, (Int, Int)],
                         acCode: Map[Int, (Int, Int)]): Long = {
    val diff = q(0) - prev
    val t = category(diff)
    val (dc, dl) = dcCode(t)
    bw.put(dc, dl)
    if (t > 0) {
      val v = if (diff < 0) (diff + (1L << t) - 1).toInt else diff.toInt
      bw.put(v & ((1 << t) - 1), t)
    }
    var run = 0
    var k = 1
    while (k < 64) {
      val coef = q(Zigzag(k))
      if (coef == 0L) run += 1
      else {
        while (run > 15) { val (z, zl) = acCode(0xF0); bw.put(z, zl); run -= 16 }
        val s = category(coef)
        val (a, al) = acCode((run << 4) | s)
        bw.put(a, al)
        val v = if (coef < 0) (coef + (1L << s) - 1).toInt else coef.toInt
        bw.put(v & ((1 << s) - 1), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (e, el) = acCode(0x00); bw.put(e, el) } // EOB
    q(0)
  }

  /** Level-shift the 8×8 block at block coords (bx, by) of a `pw`-wide
    * plane into `block`. */
  private def grabBlock(plane: Array[Byte], pw: Int, bx: Int, by: Int,
                        block: Array[Int]): Unit = {
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        block(i * 8 + j) = (plane((by * 8 + i) * pw + bx * 8 + j) & 0xff) - 128
        j += 1
      }
      i += 1
    }
  }

  /** Header writer shared by the 4:4:4 and 4:2:0 encoders: SOI, DQT (one
    * all-ones 8-bit table, id 0), SOF0 with the given per-component
    * sampling factors, both Annex-K DHTs, SOS. */
  private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
                           samp: Array[Int], restartInterval: Int = 0): Unit = {
    val nc = samp.length
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64) // DQT: one 8-bit table, id 0, all ones
    out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    marker(0xC0); u16(2 + 6 + 3 * nc) // SOF0
    out.write(8); u16(h); u16(w); out.write(nc)
    (0 until nc).foreach { c =>
      out.write(c + 1); out.write(samp(c)); out.write(0) // id, HiVi, qtable 0
    }
    def dht(clazz: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length)
      out.write(clazz << 4) // class, table id 0
      bits.foreach(out.write); out.write(vals, 0, vals.length)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { // DRI: restart every N MCUs
      marker(0xDD); u16(4); u16(restartInterval)
    }
    marker(0xDA); u16(2 + 1 + 2 * nc + 3) // SOS
    out.write(nc)
    (1 to nc).foreach { c => out.write(c); out.write(0x00) } // DC 0 / AC 0
    out.write(0); out.write(63); out.write(0) // spectral selection
  }

  /** Shared encoder: 1 plane = grayscale, 3 planes = YCbCr 4:4:4. All
    * components are full-resolution and reference quant/Huffman table 0;
    * MCUs interleave one 8×8 block per component in component order with
    * per-component DC predictors, per T.81 interleaved scan rules. */
  private def encodePlanes(w: Int, h: Int, planes: Array[Array[Byte]],
                           restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0, s"dims must be 8-multiples: ${w}x$h")
    require(planes.length == 1 || planes.length == 3, "1 or 3 components")
    planes.foreach(pl => require(pl.length == w * h,
      s"need ${w * h} samples per plane, got ${pl.length}"))
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    require(restartInterval >= 0, "restart interval must be non-negative")
    writeHeaders(out, w, h, Array.fill(nc)(0x11), restartInterval)
    val dcCode = canonical(DcBits, DcVals)
    val acCode = canonical(AcBits, AcVals)
    val bw = new BitWriter(out)
    val prevDc = new Array[Long](nc)
    val block = new Array[Int](64)
    val nMcu = (h / 8) * (w / 8)
    var mcu = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        // restart marker BETWEEN interval groups (never before the first
        // or after the last MCU); DC predictors reset with each group
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(prevDc, 0L)
        }
        var c = 0
        while (c < nc) {
          grabBlock(planes(c), w, bx, by, block)
          prevDc(c) = writeBlock(bw, forwardBlock(block), prevDc(c), dcCode, acCode)
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    require(mcu == nMcu, s"MCU count mismatch: $mcu vs $nMcu")
    bw.flush()
    out.write(0xff); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode row-major 8-bit grayscale as a PROGRESSIVE JPEG (SOF2, T.81
    * Annex G) — the coding most web JPEGs actually use. The quantized
    * coefficient grid is IDENTICAL to [[encodeGray]]'s (same integer DCT,
    * same all-ones table); progressive coding is entropy TRANSPORT only,
    * so the decoded pixels are byte-identical across the two codings —
    * the property the mm_decode_jpeg_prog oracle pins.
    *
    * Two scan scripts (both real-world shapes):
    *  - `successiveApprox = true` (the libjpeg-style default): DC first at
    *    Al=1 → AC 1..5 first at Al=1 → AC 6..63 first at Al=1 → DC
    *    refinement bit → AC refinement 1..63 to Al=0. Exercises point
    *    transforms, newly-significant insertion, buffered correction
    *    bits and the ZRL/EOB refinement transport.
    *  - `successiveApprox = false`: spectral selection only (Al=0
    *    everywhere): DC → AC 1..9 → AC 10..63. Exercises multi-scan band
    *    assembly without approximation.
    *
    * Single component, non-interleaved scans (one block per MCU, raster
    * order), EOB runs of length 1 only (EOB0 — keeps the scan symbols
    * inside the Annex-K alphabet), no restart markers. */
  def encodeGrayProgressive(w: Int, h: Int, gray: Array[Byte],
                            successiveApprox: Boolean = true): Array[Byte] =
    encodeProgressiveCore(w, h, Array(gray), successiveApprox)

  /** Encode row-major RGB triples as a PROGRESSIVE YCbCr 4:4:4 COLOR JPEG
    * (SOF2, 3 components) — the shape most web JPEGs actually are. Same
    * integer-exact color matrix and coefficient grid as [[encodeRgb]];
    * the DC scans are INTERLEAVED across the three components (legal and
    * the common encoder choice) while every AC scan is single-component,
    * as T.81 REQUIRES in progressive mode. Decoded pixels are
    * byte-identical to the baseline 4:4:4 coding. */
  def encodeRgbProgressive(w: Int, h: Int, rgb: Array[Byte],
                           successiveApprox: Boolean = true): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val (y, cb, cr) = yccPlanes(w, h, rgb)
    encodeProgressiveCore(w, h, Array(y, cb, cr), successiveApprox)
  }

  /** Shared progressive encoder: 1 plane = grayscale, 3 = YCbCr 4:4:4.
    * DC scans interleave all components in MCU order (one block per
    * component at 1×1 sampling); AC scans are per-component per the
    * progressive-mode rule. EOB runs of length 1 only (EOB0 — keeps the
    * scan symbols inside the Annex-K alphabet), no restart markers. */
  private def encodeProgressiveCore(w: Int, h: Int, planes: Array[Array[Byte]],
                                    successiveApprox: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0, s"dims must be 8-multiples: ${w}x$h")
    require(planes.length == 1 || planes.length == 3, "1 or 3 components")
    planes.foreach(pl => require(pl.length == w * h,
      s"need ${w * h} samples per plane, got ${pl.length}"))
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64) // DQT: one 8-bit table, id 0, all ones
    out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    marker(0xC2); u16(2 + 6 + 3 * nc) // SOF2
    out.write(8); u16(h); u16(w); out.write(nc)
    (0 until nc).foreach { c =>
      out.write(c + 1); out.write(0x11); out.write(0) // id, 1x1, qtable 0
    }
    def dht(clazz: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length)
      out.write(clazz << 4)
      bits.foreach(out.write); out.write(vals, 0, vals.length)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    // per-component quantized blocks, raster order — the same grids the
    // sequential encoders transport
    val block = new Array[Int](64)
    val blocks: Array[Array[Array[Long]]] = planes.map { pl =>
      (for (by <- 0 until h / 8; bx <- 0 until w / 8) yield {
        grabBlock(pl, w, bx, by, block)
        forwardBlock(block)
      }).toArray
    }
    val nBlocks = blocks(0).length
    val dcCode = canonical(DcBits, DcVals)
    val acCode = canonical(AcBits, AcVals)
    def scan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)
            (body: BitWriter => Unit): Unit = {
      marker(0xDA); u16(2 + 1 + 2 * comps.length + 3)
      out.write(comps.length)
      comps.foreach { c => out.write(c + 1); out.write(0x00) } // id, DC 0 / AC 0
      out.write(ss); out.write(se); out.write((ah << 4) | al)
      val bw = new BitWriter(out)
      body(bw)
      bw.flush()
    }
    def putMag(bw: BitWriter, v: Long, t: Int): Unit = if (t > 0) {
      val bitsv = if (v < 0) (v + (1L << t) - 1).toInt else v.toInt
      bw.put(bitsv & ((1 << t) - 1), t)
    }
    // DC first: interleaved MCU order (block b, components in order),
    // per-component DPCM over the point-transformed DC (arithmetic shift,
    // T.81 G.1.2.1), same category coding as sequential
    def dcFirst(al: Int): Unit = scan(0 until nc, 0, 0, 0, al) { bw =>
      val prev = new Array[Long](nc)
      var b = 0
      while (b < nBlocks) {
        var c = 0
        while (c < nc) {
          val v = blocks(c)(b)(0) >> al
          val diff = v - prev(c); prev(c) = v
          val t = category(diff)
          val (code, l) = dcCode(t); bw.put(code, l)
          putMag(bw, diff, t)
          c += 1
        }
        b += 1
      }
    }
    // DC refinement: one raw bit per block per component (no Huffman)
    def dcRefine(al: Int): Unit = scan(0 until nc, 0, 0, al + 1, al) { bw =>
      var b = 0
      while (b < nBlocks) {
        var c = 0
        while (c < nc) {
          bw.put(((blocks(c)(b)(0) >> al) & 1L).toInt, 1)
          c += 1
        }
        b += 1
      }
    }
    // AC first scan of one component's band: sequential run-length coding
    // over the point-transformed values (signed division truncating
    // toward zero, T.81 G.1.2.2), EOB0 closing each block
    def acFirst(comp: Int, ss: Int, se: Int, al: Int): Unit =
      scan(Seq(comp), ss, se, 0, al) { bw =>
        blocks(comp).foreach { q =>
          var run = 0
          var k = ss
          while (k <= se) {
            val v = q(Zigzag(k)) / (1L << al)
            if (v == 0L) run += 1
            else {
              while (run > 15) { val (z, zl) = acCode(0xF0); bw.put(z, zl); run -= 16 }
              val t = category(v)
              val (a, alen) = acCode((run << 4) | t); bw.put(a, alen)
              putMag(bw, v, t)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (e, el) = acCode(0x00); bw.put(e, el) }
        }
      }
    // AC refinement scan (T.81 G.1.2.3 / the public libjpeg shape):
    // newly-significant coefficients (|v|>>Al == 1) emit run/1 symbols
    // whose runs count only ZERO-HISTORY positions; already-nonzero
    // coefficients contribute buffered correction bits, flushed after
    // each emitted symbol (the decoder consumes them while advancing);
    // pending ZRLs flush BEFORE buffering a correction so the bit order
    // matches the decoder's walk exactly; trailing runs/corrections fold
    // into EOB0.
    def acRefine(comp: Int, ss: Int, se: Int, al: Int): Unit =
      scan(Seq(comp), ss, se, al + 1, al) { bw =>
        blocks(comp).foreach { q =>
          val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
          def flush(): Unit = { pending.foreach(b => bw.put(b, 1)); pending.clear() }
          var r = 0
          var k = ss
          while (k <= se) {
            val v = q(Zigzag(k))
            val t = math.abs(v) >> al
            if (t == 0L) r += 1
            else {
              while (r > 15) { val (z, zl) = acCode(0xF0); bw.put(z, zl); r -= 16; flush() }
              if (t > 1L) pending += (t & 1L).toInt
              else {
                val (a, alen) = acCode((r << 4) | 1); bw.put(a, alen); r = 0
                bw.put(if (v > 0) 1 else 0, 1)
                flush()
              }
            }
            k += 1
          }
          if (r > 0 || pending.nonEmpty) {
            val (e, el) = acCode(0x00); bw.put(e, el)
            flush()
          }
        }
      }
    if (successiveApprox) {
      dcFirst(1)
      (0 until nc).foreach(c => acFirst(c, 1, 5, 1))
      (0 until nc).foreach(c => acFirst(c, 6, 63, 1))
      dcRefine(0)
      (0 until nc).foreach(c => acRefine(c, 1, 63, 0))
    } else {
      dcFirst(0)
      (0 until nc).foreach(c => acFirst(c, 1, 9, 0))
      (0 until nc).foreach(c => acFirst(c, 10, 63, 0))
    }
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Encode row-major RGB triples as a baseline YCbCr **4:2:0** JPEG —
    * the sampling every real-world camera JPEG uses: Y at full resolution
    * (factor 2×2), Cb/Cr at half resolution both directions (1×1). Each
    * chroma sample is the REPLAYABLE average of its 2×2 full-resolution
    * block: (c00 + c01 + c10 + c11 + 2) / 4 with truncating division
    * (values are 0..255 so this equals DuckDB's `//`). MCUs are 16×16
    * pixels: four Y blocks left-to-right top-to-bottom, then one Cb and
    * one Cr block, per the T.81 interleaved-scan block order. Dims must
    * be multiples of 16 (one full MCU grid; the fixture guarantees it). */
  /** Integer-exact JFIF color conversion shared by the subsampled
    * encoders: full-resolution (Y, Cb, Cr) planes of an RGB image. */
  private def yccPlanes(w: Int, h: Int, rgb: Array[Byte])
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val y = new Array[Byte](w * h)
    val cbF = new Array[Byte](w * h)
    val crF = new Array[Byte](w * h)
    var p = 0
    while (p < w * h) {
      val r = rgb(3 * p) & 0xff; val g = rgb(3 * p + 1) & 0xff; val b = rgb(3 * p + 2) & 0xff
      y(p) = clamp255((299L * r + 587L * g + 114L * b + 500L) / 1000L)
      cbF(p) = clamp255((-1687L * r - 3313L * g + 5000L * b + 5000L) / 10000L + 128L)
      crF(p) = clamp255((5000L * r - 4187L * g - 813L * b + 5000L) / 10000L + 128L)
      p += 1
    }
    (y, cbF, crF)
  }

  def encodeRgb420(w: Int, h: Int, rgb: Array[Byte],
                   restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      s"4:2:0 dims must be 16-multiples: ${w}x$h")
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val (y, cbF, crF) = yccPlanes(w, h, rgb)
    val hw = w / 2; val hh = h / 2
    def subsample(full: Array[Byte]): Array[Byte] = {
      val half = new Array[Byte](hw * hh)
      var y2 = 0
      while (y2 < hh) {
        var x2 = 0
        while (x2 < hw) {
          val base = (2 * y2) * w + 2 * x2
          val s = (full(base) & 0xff) + (full(base + 1) & 0xff) +
                  (full(base + w) & 0xff) + (full(base + w + 1) & 0xff)
          half(y2 * hw + x2) = ((s + 2) / 4).toByte
          x2 += 1
        }
        y2 += 1
      }
      half
    }
    val cb = subsample(cbF)
    val cr = subsample(crF)
    val out = new java.io.ByteArrayOutputStream()
    require(restartInterval >= 0, "restart interval must be non-negative")
    writeHeaders(out, w, h, Array(0x22, 0x11, 0x11), restartInterval)
    val dcCode = canonical(DcBits, DcVals)
    val acCode = canonical(AcBits, AcVals)
    val bw = new BitWriter(out)
    val prevDc = new Array[Long](3)
    val block = new Array[Int](64)
    var mcu = 0
    var by = 0
    while (by < h / 16) {
      var bx = 0
      while (bx < w / 16) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(prevDc, 0L)
        }
        // four Y blocks: (0,0) (0,1) (1,0) (1,1) in (row, col) block order
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            grabBlock(y, w, bx * 2 + dx, by * 2 + dy, block)
            prevDc(0) = writeBlock(bw, forwardBlock(block), prevDc(0), dcCode, acCode)
            dx += 1
          }
          dy += 1
        }
        grabBlock(cb, hw, bx, by, block)
        prevDc(1) = writeBlock(bw, forwardBlock(block), prevDc(1), dcCode, acCode)
        grabBlock(cr, hw, bx, by, block)
        prevDc(2) = writeBlock(bw, forwardBlock(block), prevDc(2), dcCode, acCode)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode row-major RGB triples as a baseline YCbCr **4:2:2** JPEG —
    * the broadcast/video-editing sampling (Rec. 601 studio pipelines,
    * MJPEG hardware): Y at 2×1, Cb/Cr at half HORIZONTAL resolution only.
    * Each chroma sample is the replayable average of its 2 horizontal
    * full-resolution neighbors: (c0 + c1 + 1) / 2 with truncating
    * division. MCUs are 16×8 pixels: two Y blocks left-to-right, then one
    * Cb and one Cr block, per the T.81 interleaved block order. Dims must
    * be multiples of 16 (w) and 8 (h). */
  def encodeRgb422(w: Int, h: Int, rgb: Array[Byte],
                   restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 8 == 0,
      s"4:2:2 dims must be 16 (w) / 8 (h) multiples: ${w}x$h")
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val (y, cbF, crF) = yccPlanes(w, h, rgb)
    val hw = w / 2
    def subsampleH(full: Array[Byte]): Array[Byte] = {
      val half = new Array[Byte](hw * h)
      var yy = 0
      while (yy < h) {
        var x2 = 0
        while (x2 < hw) {
          val base = yy * w + 2 * x2
          val s = (full(base) & 0xff) + (full(base + 1) & 0xff)
          half(yy * hw + x2) = ((s + 1) / 2).toByte
          x2 += 1
        }
        yy += 1
      }
      half
    }
    val cb = subsampleH(cbF)
    val cr = subsampleH(crF)
    val out = new java.io.ByteArrayOutputStream()
    require(restartInterval >= 0, "restart interval must be non-negative")
    writeHeaders(out, w, h, Array(0x21, 0x11, 0x11), restartInterval)
    val dcCode = canonical(DcBits, DcVals)
    val acCode = canonical(AcBits, AcVals)
    val bw = new BitWriter(out)
    val prevDc = new Array[Long](3)
    val block = new Array[Int](64)
    var mcu = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 16) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(prevDc, 0L)
        }
        // two Y blocks left-to-right, then Cb, then Cr
        var dx = 0
        while (dx < 2) {
          grabBlock(y, w, bx * 2 + dx, by, block)
          prevDc(0) = writeBlock(bw, forwardBlock(block), prevDc(0), dcCode, acCode)
          dx += 1
        }
        grabBlock(cb, hw, bx, by, block)
        prevDc(1) = writeBlock(bw, forwardBlock(block), prevDc(1), dcCode, acCode)
        grabBlock(cr, hw, bx, by, block)
        prevDc(2) = writeBlock(bw, forwardBlock(block), prevDc(2), dcCode, acCode)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode row-major RGB triples as a baseline YCbCr **4:1:1** JPEG —
    * the DV/consumer-camcorder sampling: Y at 4×1, Cb/Cr at quarter
    * HORIZONTAL resolution. Each chroma sample is the replayable average
    * of its 4 horizontal neighbors: (c0 + c1 + c2 + c3 + 2) / 4. MCUs are
    * 32×8 pixels: four Y blocks left-to-right, then Cb, then Cr. Dims
    * must be multiples of 32 (w) and 8 (h). */
  def encodeRgb411(w: Int, h: Int, rgb: Array[Byte],
                   restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 32 == 0 && h % 8 == 0,
      s"4:1:1 dims must be 32 (w) / 8 (h) multiples: ${w}x$h")
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val (y, cbF, crF) = yccPlanes(w, h, rgb)
    val qw = w / 4
    def subsampleQ(full: Array[Byte]): Array[Byte] = {
      val quarter = new Array[Byte](qw * h)
      var yy = 0
      while (yy < h) {
        var x4 = 0
        while (x4 < qw) {
          val base = yy * w + 4 * x4
          val s = (full(base) & 0xff) + (full(base + 1) & 0xff) +
                  (full(base + 2) & 0xff) + (full(base + 3) & 0xff)
          quarter(yy * qw + x4) = ((s + 2) / 4).toByte
          x4 += 1
        }
        yy += 1
      }
      quarter
    }
    val cb = subsampleQ(cbF)
    val cr = subsampleQ(crF)
    val out = new java.io.ByteArrayOutputStream()
    require(restartInterval >= 0, "restart interval must be non-negative")
    writeHeaders(out, w, h, Array(0x41, 0x11, 0x11), restartInterval)
    val dcCode = canonical(DcBits, DcVals)
    val acCode = canonical(AcBits, AcVals)
    val bw = new BitWriter(out)
    val prevDc = new Array[Long](3)
    val block = new Array[Int](64)
    var mcu = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 32) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(prevDc, 0L)
        }
        // four Y blocks left-to-right, then Cb, then Cr
        var dx = 0
        while (dx < 4) {
          grabBlock(y, w, bx * 4 + dx, by, block)
          prevDc(0) = writeBlock(bw, forwardBlock(block), prevDc(0), dcCode, acCode)
          dx += 1
        }
        grabBlock(cb, qw, bx, by, block)
        prevDc(1) = writeBlock(bw, forwardBlock(block), prevDc(1), dcCode, acCode)
        grabBlock(cr, qw, bx, by, block)
        prevDc(2) = writeBlock(bw, forwardBlock(block), prevDc(2), dcCode, acCode)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------- decode

  private final case class Huff(maxLen: Int, lookup: Map[(Int, Int), Int])

  private def buildHuff(bits: Array[Int], vals: Array[Byte]): Huff = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map.empty[(Int, Int), Int]
    var maxLen = 0
    for (len <- 1 to 16) {
      var n = 0
      while (n < bits(len - 1)) {
        m((len, code)) = vals(k) & 0xff
        maxLen = len
        code += 1; k += 1; n += 1
      }
      code <<= 1
    }
    Huff(maxLen, m.toMap)
  }

  private def readSym(br: BitReader, h: Huff): Int = {
    var code = 0; var len = 0
    while (len <= h.maxLen) {
      code = (code << 1) | br.bit(); len += 1
      h.lookup.get((len, code)) match {
        case Some(s) => return s
        case None => ()
      }
    }
    throw new IllegalArgumentException("JPEG: invalid Huffman code")
  }

  private def extend(v: Int, t: Int): Long =
    if (t == 0) 0L
    else if (v < (1 << (t - 1))) v.toLong - (1L << t) + 1
    else v.toLong

  /** Parse a baseline grayscale JPEG into (width, height, gray). */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, planes) = decodePlanes(payload)
    require(planes.length == 1, s"expected grayscale, got ${planes.length} components")
    (w, h, planes(0))
  }

  /** Parse a baseline YCbCr 4:4:4 color JPEG into (width, height, RGB
    * triples) — the inverse JFIF matrix in the same integer-exact,
    * truncating-division form as [[encodeRgb]]:
    *   R = Y + (1402(Cr−128) + 500)/1000
    *   G = Y − (3441(Cb−128) + 7141(Cr−128) + 5000)/10000
    *   B = Y + (1772(Cb−128) + 500)/1000, clamped. */
  def decodeRgb(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, planes) = decodePlanes(payload)
    require(planes.length == 3, s"expected YCbCr, got ${planes.length} components")
    (w, h, ycbcrToRgb(w, h, planes))
  }

  private def ycbcrToRgb(w: Int, h: Int, planes: Array[Array[Byte]]): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val y = (planes(0)(p) & 0xff).toLong
      val cb = (planes(1)(p) & 0xff).toLong - 128
      val cr = (planes(2)(p) & 0xff).toLong - 128
      rgb(3 * p) = clamp255(y + (1402L * cr + 500L) / 1000L)
      rgb(3 * p + 1) = clamp255(y - (3441L * cb + 7141L * cr + 5000L) / 10000L)
      rgb(3 * p + 2) = clamp255(y + (1772L * cb + 500L) / 1000L)
      p += 1
    }
    rgb
  }

  /** Core parse: marker walk, DHT/DQT rebuilt FROM the stream, interleaved
    * MCU entropy decode with per-component DC predictors, dequantize,
    * integer IDCT. 1 or 3 components sharing table 0, full-resolution
    * (grayscale / 4:4:4) or 4:2:0 (subsampled chroma is decoded on its
    * half-resolution grid, then upsampled to full resolution by sample
    * replication, so the returned planes are always w×h). PROGRESSIVE
    * (SOF2) grayscale streams route to the multi-scan coefficient
    * assembly below. Unsupported shapes (progressive color, 4:2:2/4:1:1,
    * 16-bit DQT) fail loudly. */
  def decodePlanes(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    require(payload.length > 4 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8, "not a JPEG payload (no SOI)")
    var pos = 2
    var w = -1; var h = -1; var nc = -1
    var samp: Array[Int] = null // per-component packed HiVi byte
    var compIds: Array[Int] = null // SOF component ids, scan-header lookup
    var qt: Array[Int] = null
    var restartInterval = 0 // DRI; 0 = no restart markers
    var dcH: Huff = null; var acH: Huff = null
    var progressive = false // SOF2
    def u16(p: Int): Int = ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
    /** Parse one DHT segment's tables into dcH/acH (shared by the header
      * walk and, for progressive streams, inter-scan table redefinition). */
    def parseDht(segStart: Int, segEnd: Int): Unit = {
      var p = segStart
      while (p < segEnd) {
        val clazz = (payload(p) & 0xf0) >> 4
        // same loud-failure contract as DQT: only table id 0 exists
        // here, so a stream carrying DC/AC table id 1 must be rejected,
        // not silently decoded with whichever table was parsed last
        require((payload(p) & 0x0f) == 0, "JPEG: only Huffman table id 0 supported")
        val bits = Array.tabulate(16)(i => payload(p + 1 + i) & 0xff)
        val nv = bits.sum
        val vals = java.util.Arrays.copyOfRange(payload, p + 17, p + 17 + nv)
        if (clazz == 0) dcH = buildHuff(bits, vals) else acH = buildHuff(bits, vals)
        p += 17 + nv
      }
    }
    var sosAt = -1
    var sosHdr = -1 // position of the current SOS segment's ns byte
    while (sosAt < 0) {
      require(pos + 4 <= payload.length, "JPEG: truncated marker stream")
      require((payload(pos) & 0xff) == 0xff, s"JPEG: expected marker at $pos")
      val m = payload(pos + 1) & 0xff
      val len = u16(pos + 2)
      m match {
        case 0xDB =>
          // loud-failure contract: a DQT segment may legally hold SEVERAL
          // tables (libjpeg writes luma id 0 + chroma id 1 in one segment)
          // and components reference tables by id — this decoder supports
          // exactly one table, id 0, used by every component, and must
          // REJECT anything else rather than silently dequantize with the
          // wrong table
          require(len == 2 + 1 + 64,
            s"JPEG: multi-table or non-8-bit DQT segment unsupported (len $len)")
          require((payload(pos + 4) & 0xf0) == 0, "JPEG: 16-bit DQT unsupported")
          require((payload(pos + 4) & 0x0f) == 0, "JPEG: only DQT table id 0 supported")
          qt = Array.tabulate(64)(i => payload(pos + 5 + i) & 0xff)
        case 0xC0 | 0xC2 =>
          progressive = (payload(pos + 1) & 0xff) == 0xC2
          require(payload(pos + 4) == 8, "JPEG: only 8-bit precision")
          h = u16(pos + 5); w = u16(pos + 7)
          nc = payload(pos + 9) & 0xff
          require(nc == 1 || nc == 3, s"JPEG: $nc components unsupported")
          compIds = Array.tabulate(nc)(c => payload(pos + 10 + 3 * c) & 0xff)
          samp = Array.tabulate(nc)(c => payload(pos + 11 + 3 * c) & 0xff)
          // supported sampling shapes: all components full-resolution
          // (grayscale / YCbCr 4:4:4), the real-world camera default
          // 4:2:0 (Y at 2×2, chroma at 1×1), broadcast 4:2:2 (Y at 2×1),
          // or DV/camcorder 4:1:1 (Y at 4×1). Anything else (vertical-only
          // 4:4:0, asymmetric factors) fails LOUDLY rather than
          // mis-tiling. The plane machinery below is generic over the
          // factors — only this gate and the encoders are shape-specific.
          require(samp.forall(_ == 0x11) ||
                  (nc == 3 &&
                   (samp(0) == 0x22 || samp(0) == 0x21 || samp(0) == 0x41) &&
                   samp(1) == 0x11 && samp(2) == 0x11),
            s"JPEG: unsupported sampling ${samp.map(v => f"$v%02x").mkString(",")}")
          (0 until nc).foreach { c =>
            require((payload(pos + 12 + 3 * c) & 0xff) == 0,
              "JPEG: only quantization table 0 supported (component Tq != 0)")
          }
        case 0xC1 | 0xC3 =>
          throw new IllegalArgumentException(
            "JPEG: only baseline SOF0 and progressive SOF2 supported")
        case 0xC4 =>
          parseDht(pos + 4, pos + 2 + len)
        case 0xDD =>
          // DRI: restart interval in MCUs (real-world encoders emit this
          // for error resilience / parallel segment decode)
          require(len == 4, s"JPEG: bad DRI length $len")
          restartInterval = u16(pos + 4)
        case 0xDA =>
          // validate the scan header's Td/Tc selectors reference table 0
          // (byte after each component id), mirroring the DHT check above
          val ns = payload(pos + 4) & 0xff
          (0 until ns).foreach { c =>
            require((payload(pos + 6 + 2 * c) & 0xff) == 0,
              "JPEG: SOS references a non-zero Huffman table")
          }
          sosHdr = pos + 4
          sosAt = pos + 2 + len
        case _ => () // APPn / COM: skip after length
      }
      pos += 2 + len
    }
    require(w > 0 && h > 0 && nc > 0 && qt != null && dcH != null && acH != null,
      "JPEG: missing SOF/DQT/DHT before SOS")
    // -------------------------------------------------- progressive path
    // SOF2 (T.81 Annex G): coefficients accumulate across SCANS — DC
    // first/refinement, AC spectral bands first/refinement with EOB runs —
    // then one dequantize + IDCT at the end. Entropy transport only: the
    // reconstructed coefficient grid equals what a sequential scan of the
    // same quantized blocks would carry, so decoded pixels are
    // byte-identical to the baseline coding (the mm_decode_jpeg_prog
    // oracle replays the baseline chain for both codings on that basis).
    // Scope: 1×1-sampled components (grayscale / YCbCr 4:4:4), DC scans
    // optionally interleaved, AC scans single-component (the
    // progressive-mode RULE, T.81 §G.1), no DRI — anything else fails
    // loudly below.
    if (progressive) {
      require(samp.forall(_ == 0x11),
        "JPEG: progressive subsampled components unsupported")
      require(restartInterval == 0, "JPEG: DRI inside progressive unsupported")
      require(w % 8 == 0 && h % 8 == 0,
        s"JPEG: dims must tile whole blocks, got ${w}x$h")
      val nBlocks = (w / 8) * (h / 8)
      val coefs = Array.fill(nc, nBlocks)(new Array[Long](64))

      // decode one scan's entropy data (scomps = component indices in scan
      // order) over all blocks in raster order; returns the reader (its
      // pos marks the end of consumed bytes)
      def decodeScan(scomps: Array[Int], entStart: Int,
                     ss: Int, se: Int, ah: Int, al: Int): BitReader = {
        val br = new BitReader(payload, entStart)
        var eobrun = 0L
        val preds = new Array[Long](nc)
        val p1 = 1L << al
        if (ss == 0) { // DC scan — may interleave components (MCU order)
          require(se == 0, "JPEG: progressive DC scan must have Se=0")
          var b = 0
          while (b < nBlocks) {
            var ci = 0
            while (ci < scomps.length) {
              val c = scomps(ci)
              val q = coefs(c)(b)
              if (ah == 0) {
                val t = readSym(br, dcH)
                preds(c) += extend(br.bits(t), t)
                q(0) = preds(c) << al
              } else {
                // refinement appends the next lower bit (two's-complement
                // OR matches the arithmetic-shift point transform exactly)
                if (br.bit() == 1) q(0) |= p1
              }
              ci += 1
            }
            b += 1
          }
          return br
        }
        // AC scans: exactly one component, per the progressive-mode rule
        require(scomps.length == 1,
          "JPEG: progressive AC scans must be single-component")
        val comp = scomps(0)
        var b = 0
        while (b < nBlocks) {
          val q = coefs(comp)(b)
          if (ah == 0) { // AC first scan of the band [ss, se]
            require(ss >= 1 && se <= 63 && ss <= se, "JPEG: bad spectral band")
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var brk = false
              while (k <= se && !brk) {
                val rs = readSym(br, acH)
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else { // EOBn: this block ends; r more whole blocks skip
                    eobrun = (1L << r) - 1 + (if (r > 0) br.bits(r) else 0)
                    brk = true
                  }
                } else {
                  k += r
                  require(k <= se, "JPEG: AC run overflows band")
                  q(Zigzag(k)) = extend(br.bits(s), s) << al
                  k += 1
                }
              }
            }
          } else { // AC refinement scan
            require(ss >= 1 && se <= 63 && ss <= se, "JPEG: bad spectral band")
            def correct(z: Int): Unit =
              if (br.bit() == 1 && (math.abs(q(z)) & p1) == 0L)
                q(z) += (if (q(z) > 0) p1 else -p1)
            var k = ss
            if (eobrun == 0) {
              var brk = false
              while (k <= se && !brk) {
                val rs = readSym(br, acH)
                var r = rs >> 4; val s = rs & 15
                var newval = 0L
                if (s != 0) {
                  require(s == 1, "JPEG: refinement symbol magnitude must be 1")
                  newval = if (br.bit() == 1) p1 else -p1
                } else if (r != 15) { // EOBn (ZRL keeps r=15, s=0)
                  eobrun = (1L << r) + (if (r > 0) br.bits(r) else 0)
                  brk = true
                }
                if (!brk) {
                  // advance: skip r zero-HISTORY coefficients, consuming a
                  // correction bit at each nonzero-history one passed
                  var adv = true
                  while (adv && k <= se) {
                    val z = Zigzag(k)
                    if (q(z) != 0L) { correct(z); k += 1 }
                    else if (r == 0) adv = false
                    else { r -= 1; k += 1 }
                  }
                  if (newval != 0L) {
                    require(k <= se, "JPEG: refinement insert overruns band")
                    q(Zigzag(k)) = newval
                  }
                  k += 1
                }
              }
            }
            if (eobrun > 0) { // EOB covers the block tail: corrections only
              while (k <= se) {
                val z = Zigzag(k)
                if (q(z) != 0L) correct(z)
                k += 1
              }
              eobrun -= 1
            }
          }
          b += 1
        }
        br
      }

      var scanHdr = sosHdr
      var entStart = sosAt
      var done = false
      while (!done) {
        require(scanHdr + 1 + 2 * (payload(scanHdr) & 0xff) + 3 <= payload.length,
          "JPEG: truncated progressive scan header")
        val ns = payload(scanHdr) & 0xff
        require(ns >= 1 && ns <= nc, s"JPEG: bad scan component count $ns")
        val scomps = Array.tabulate(ns) { k =>
          val id = payload(scanHdr + 1 + 2 * k) & 0xff
          val ix = compIds.indexOf(id)
          require(ix >= 0, s"JPEG: scan references unknown component id $id")
          // Td/Ta: this decoder installs only table id 0 (DHT enforces it);
          // a conforming foreign stream whose later scan selects table 1
          // must fail LOUDLY here, not decode silently with table 0 —
          // mirrors the first-SOS check
          val tdta = payload(scanHdr + 2 + 2 * k) & 0xff
          require(tdta == 0,
            s"JPEG: progressive scan selects Huffman table ${tdta >> 4}/${tdta & 0x0f}, only 0/0 is defined")
          ix
        }
        val ss = payload(scanHdr + 1 + 2 * ns) & 0xff
        val se = payload(scanHdr + 2 + 2 * ns) & 0xff
        val ahal = payload(scanHdr + 3 + 2 * ns) & 0xff
        val br = decodeScan(scomps, entStart, ss, se,
          (ahal >> 4) & 0x0f, ahal & 0x0f)
        // skip pad bits / stuffed bytes to the next true marker; a marker
        // may be preceded by any number of 0xFF FILL bytes (T.81 B.1.1.2),
        // which are not themselves a marker code
        var p = br.pos
        while (p + 1 < payload.length &&
               !((payload(p) & 0xff) == 0xff && (payload(p + 1) & 0xff) != 0x00))
          p += 1
        while (p + 1 < payload.length && (payload(p + 1) & 0xff) == 0xff)
          p += 1
        // walk markers until the next SOS or EOI (DHT may redefine tables)
        var cont = true
        while (cont) {
          require(p + 2 <= payload.length && (payload(p) & 0xff) == 0xff,
            s"JPEG: expected marker after scan at $p")
          val m = payload(p + 1) & 0xff
          if (m == 0xD9) { done = true; cont = false }
          else {
            require(m != 0xDD && (m < 0xD0 || m > 0xD7),
              "JPEG: restart markers inside progressive unsupported")
            require(p + 4 <= payload.length,
              s"JPEG: truncated marker segment at $p")
            val len = u16(p + 2)
            m match {
              case 0xC4 => parseDht(p + 4, p + 2 + len)
              case 0xDA => scanHdr = p + 4; entStart = p + 2 + len; cont = false
              case _ => () // APPn / COM between scans: skip
            }
            p += 2 + len
          }
        }
      }

      // dequantize + IDCT every block of every component (same overflow
      // guard as baseline)
      val qd = new Array[Long](64)
      val progPlanes = Array.tabulate(nc) { c =>
        val plane = new Array[Byte](w * h)
        var b = 0
        while (b < nBlocks) {
          var g = 0
          while (g < 64) {
            qd(g) = coefs(c)(b)(g) * qt(g)
            require(math.abs(qd(g)) <= (1L << 17),
              "JPEG: coefficient magnitude exceeds the baseline 8-bit range")
            g += 1
          }
          val px = inverseBlock(qd)
          val bx = b % (w / 8); val by = b / (w / 8)
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) {
              plane((by * 8 + i) * w + bx * 8 + j) = px(i * 8 + j).toByte
              j += 1
            }
            i += 1
          }
          b += 1
        }
        plane
      }
      return (w, h, progPlanes)
    }
    // per-component sampling factors and plane geometry
    val hs = samp.map(v => (v >> 4) & 0x0f)
    val vs = samp.map(v => v & 0x0f)
    val hmax = hs.max
    val vmax = vs.max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    require(w % mcuW == 0 && h % mcuH == 0,
      s"JPEG: dims must tile whole MCUs (${mcuW}x$mcuH), got ${w}x$h")
    // component plane dims (half-resolution for subsampled chroma)
    val cw = Array.tabulate(nc)(c => w * hs(c) / hmax)
    val ch = Array.tabulate(nc)(c => h * vs(c) / vmax)
    val br = new BitReader(payload, sosAt)
    val comps = Array.tabulate(nc)(c => new Array[Byte](cw(c) * ch(c)))
    val prevDc = new Array[Long](nc)
    val q = new Array[Long](64)

    /** Entropy-decode + dequantize + IDCT one block into component `c`'s
      * plane at block coords (bx, by) of that plane's own grid. */
    def decodeBlock(c: Int, bx: Int, by: Int): Unit = {
      java.util.Arrays.fill(q, 0L)
      val t = readSym(br, dcH)
      prevDc(c) += extend(br.bits(t), t)
      q(0) = prevDc(c) * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = readSym(br, acH)
        if (rs == 0x00) eob = true
        else if (rs == 0xF0) k += 16
        else {
          k += (rs >> 4)
          require(k < 64, "JPEG: AC run overflows block")
          val s = rs & 0x0f
          q(Zigzag(k)) = extend(br.bits(s), s) * qt(Zigzag(k))
          k += 1
        }
      }
      // loud overflow guard: inverseBlock's direct double sum carries
      // up to 64 terms of |q|·Alpha²·Dct² ≈ |q|·2^46 in a Long, so
      // coefficients must stay under ~2^17. Real 8-bit image content
      // dequantizes to |q| ≲ 2.3k whatever the table; only a hostile
      // (valid-syntax) stream can exceed this — reject it instead of
      // wrapping silently.
      var g = 0
      while (g < 64) {
        require(math.abs(q(g)) <= (1L << 17),
          "JPEG: coefficient magnitude exceeds the baseline 8-bit range")
        g += 1
      }
      val px = inverseBlock(q)
      val pw = cw(c)
      var i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          comps(c)((by * 8 + i) * pw + bx * 8 + j) = px(i * 8 + j).toByte
          j += 1
        }
        i += 1
      }
    }

    // interleaved scan: per MCU, hs(c)×vs(c) blocks per component in
    // component order, each component's blocks left-to-right top-to-bottom
    // (T.81 A.2.3) — degenerates to one block per component at 1×1
    var mcu = 0
    var by = 0
    while (by < h / mcuH) {
      var bx = 0
      while (bx < w / mcuW) {
        // consume the expected RSTm at each interval boundary: pad bits
        // drop, DC predictors reset — a missing/misnumbered marker or a
        // decoder that forgets the reset fails loudly here or diverges in
        // the round-trip values
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.resync((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(prevDc, 0L)
        }
        mcu += 1
        var c = 0
        while (c < nc) {
          var dy = 0
          while (dy < vs(c)) {
            var dx = 0
            while (dx < hs(c)) {
              decodeBlock(c, bx * hs(c) + dx, by * vs(c) + dy)
              dx += 1
            }
            dy += 1
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    // upsample subsampled components to full resolution by sample
    // replication (nearest neighbor): full(x, y) = half(x·cw/w, y·ch/h)
    val planes = Array.tabulate(nc) { c =>
      if (cw(c) == w && ch(c) == h) comps(c)
      else {
        val full = new Array[Byte](w * h)
        val fx = w / cw(c); val fy = h / ch(c)
        var yy = 0
        while (yy < h) {
          var xx = 0
          while (xx < w) {
            full(yy * w + xx) = comps(c)((yy / fy) * cw(c) + xx / fx)
            xx += 1
          }
          yy += 1
        }
        full
      }
    }
    (w, h, planes)
  }

  /** Feature stats of the DECODED pixels (gray samples or RGB bytes) —
    * the mm_decode contract; routes on the stream's component count. */
  def decodeFeatures(a: MediaAsset): MediaFeatures = {
    val (w, h, planes) = decodePlanes(a.payload)
    val gray = if (planes.length == 1) planes(0)
               else ycbcrToRgb(w, h, planes)
    val hist = new Array[Long](FakeDecoder.HistBuckets)
    var sum = 0L
    var i = 0
    while (i < gray.length) {
      val b = gray(i) & 0xff
      hist(b * FakeDecoder.HistBuckets / 256) += 1
      sum += b
      i += 1
    }
    MediaFeatures(a.asset_id, a.format, gray.length.toLong,
      if (gray.length == 0) 0.0 else sum.toDouble / gray.length, hist)
  }

  /** REAL nearest-neighbor resize on the DECODED grayscale grid —
    * dst(x,y) = src(x·stride, y·stride), dims ceil-divided — fused with
    * the stats of the resized pixels (the [[PngCodec.resizeFeatures]]
    * contract; here the source pixels first pass the full entropy-decode +
    * inverse-transform chain, so resize stats are a deterministic function
    * of the encoded stream). */
  def resizeFeatures(a: MediaAsset, stride: Int): ResizedFeatures = {
    val (w, h, g) = decodeGray(a.payload)
    val dw = (w + stride - 1) / stride
    val dh = (h + stride - 1) / stride
    var sum = 0L
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        sum += g((y * stride) * w + x * stride) & 0xff
        x += 1
      }
      y += 1
    }
    val n = dw.toLong * dh
    ResizedFeatures(a.asset_id, a.format, dw, dh, n,
      if (n == 0) 0.0 else sum.toDouble / n)
  }
}
