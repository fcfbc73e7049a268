package graft.ops

/** WebP LOSSLESS (VP8L) codec — pure-JVM byte-level encode/decode of the
  * published VP8L bitstream (the WebP lossless spec): RIFF/WEBP container
  * walk, LSB-first bit reader, canonical prefix codes (simple 1-/2-symbol
  * AND full code-length-coded forms with the 16/17/18 repeat machinery),
  * LZ77 backward references with the spec's prefix-coded length/distance
  * values, the multiply-shift COLOR CACHE, and the subtract-green
  * transform — the modern web's second image format after JPEG (r16
  * verdict missing #2), built in the [[GifCodec]]/[[ZstdCodec]]
  * from-scratch class.
  *
  * Honest-subset stance (the repo's codec policy): lossy VP8 and the
  * VP8X extended container reject loudly (perceptual decode stays out of
  * sandbox scope, like MP3/H.264); within VP8L, predictor/color/indexing
  * transforms, meta prefix images, and the 2D distance map (codes
  * 1..120) reject loudly rather than mis-decode — plain distances and
  * subtract-green are implemented exactly. No third-party webp binary
  * exists in the sandbox, so conformance is by-construction from the
  * spec text plus exhaustive self round-trip specs (the PngCodec
  * posture, not the ZstdCodec both-direction interop one).
  *
  * Scale shape: one asset per typed-map call, payload never reaches an
  * exchange; decode is one pass over the bitstream. */
object WebpCodec {

  private val CacheMul = 0x1e35a7bd

  // ------------------------------------------------------------- bit io

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    /** LSB-first fixed-width field. */
    def bits(v: Int, nb: Int): Unit = {
      var i = 0
      while (i < nb) { bit((v >> i) & 1); i += 1 }
    }
    /** One prefix-code, MSB of the code first (tree-walk order). */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit((c >> i) & 1); i -= 1 }
    }
    def bit(b: Int): Unit = {
      cur |= (b & 1) << n
      n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def result(): Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(val b: Array[Byte], var pos: Int) {
    private var bit = 0
    def bits(nb: Int): Int = {
      var v = 0
      var i = 0
      while (i < nb) { v |= one() << i; i += 1 }
      v
    }
    def one(): Int = {
      require(pos < b.length, "webp: bitstream truncated")
      val r = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      r
    }
  }

  // ----------------------------------------------------- prefix codes

  /** Canonical code values from lengths (DEFLATE/VP8L convention:
    * increasing length, then symbol order). */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = lens.max
    val codes = new Array[Int](lens.length)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      var s = 0
      while (s < lens.length) {
        if (lens(s) == l) { codes(s) = code; code += 1 }
        s += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }

  /** Depth-limited Huffman lengths (plain two-queue Huffman; our
    * alphabets and fixtures never approach the limit — a run over it
    * throws rather than emitting an invalid code). Zero-frequency
    * symbols get length 0. */
  private def huffLengths(freq: Array[Long], maxLen: Int): Array[Int] = {
    val used = freq.indices.filter(freq(_) > 0)
    val lens = new Array[Int](freq.length)
    if (used.isEmpty) return lens
    if (used.length == 1) { lens(used.head) = 1; return lens }
    // (weight, depth, members)
    var q = used.map(s => (freq(s), 0, List(s)))
      .sortBy(t => (t._1, t._3.head)).toList
    while (q.length > 1) {
      val a :: b :: rest = q: @unchecked
      val merged = (a._1 + b._1, math.max(a._2, b._2) + 1, a._3 ++ b._3)
      a._3.foreach(s => lens(s) += 1)
      b._3.foreach(s => lens(s) += 1)
      q = (merged :: rest).sortBy(t => (t._1, t._3.head))
    }
    require(lens.max <= maxLen,
      s"webp: huffman depth ${lens.max} exceeds $maxLen (fixture too skewed)")
    lens
  }

  /** Decoder-side prefix code: either a zero-bit single symbol or a
    * (length -> code -> symbol) walk table. */
  private class PrefixCode(val single: Int, lens: Array[Int]) {
    // canonical first-code/offset arrays (the JPEG-decoder shape): per
    // length, symbols sorted by (length, symbol) occupy a contiguous
    // code range starting at firstCode(l) — the per-bit walk is two
    // array reads, no boxing (the Map walk cost ~2x decode time)
    val maxLen: Int = if (single >= 0) 0 else lens.max
    private val count = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    private val syms: Array[Int] =
      if (single >= 0) Array.emptyIntArray
      else {
        lens.foreach(l => if (l > 0) count(l) += 1)
        var code = 0
        var off = 0
        var l = 1
        while (l <= maxLen) {
          firstCode(l) = code
          offset(l) = off
          code = (code + count(l)) << 1
          off += count(l)
          l += 1
        }
        val out = new Array[Int](off)
        val fill = offset.clone()
        var s2 = 0
        while (s2 < lens.length) {
          if (lens(s2) > 0) { out(fill(lens(s2))) = s2; fill(lens(s2)) += 1 }
          s2 += 1
        }
        out
      }
    def read(r: BitReader): Int = {
      if (single >= 0) return single
      var codeAcc = 0
      var l = 0
      while (l < maxLen) {
        codeAcc = (codeAcc << 1) | r.one()
        l += 1
        val idx = codeAcc - firstCode(l)
        if (idx >= 0 && idx < count(l)) return syms(offset(l) + idx)
      }
      throw new IllegalArgumentException("webp: invalid prefix code in stream")
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Emit one prefix code header + lengths (spec 5.2.1): the simple
    * 1-/2-symbol form when the used symbols fit 8 bits, else the full
    * code-length-coded form with 16/17/18 repeats. Returns whether the
    * emitted form makes the DECODER consume bits per symbol — false only
    * for the zero-bit simple 1-symbol form; a normal-form code with one
    * used symbol (a >255 symbol cannot use the simple form) still walks
    * one bit per read, so the token emitter MUST write that bit or the
    * two sides desync (review finding: an all-zero image with the cache
    * on tokenizes to cache code 280 only). */
  private def writePrefixCode(bw: BitWriter, lens: Array[Int]): Boolean = {
    val used = lens.indices.filter(lens(_) > 0)
    if (used.length == 1 && used.head <= 255) {
      bw.bits(1, 1) // simple
      bw.bits(0, 1) // num_symbols - 1 = 0
      if (used.head <= 1) { bw.bits(0, 1); bw.bits(used.head, 1) }
      else { bw.bits(1, 1); bw.bits(used.head, 8) }
      return false
    }
    if (used.length == 2 && used.forall(_ <= 255)) {
      require(lens(used.head) == 1 && lens(used(1)) == 1,
        "webp: 2-symbol simple code needs both lengths 1")
      bw.bits(1, 1); bw.bits(1, 1) // simple, two symbols
      bw.bits(1, 1); bw.bits(used.head, 8) // first symbol, 8-bit form
      bw.bits(used(1), 8)
      return true
    }
    bw.bits(0, 1) // normal form
    // RLE the length array with 16 (repeat prev nonzero 3-6),
    // 17 (zeros 3-10), 18 (zeros 11-138)
    val rle = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < lens.length) {
      val v = lens(i)
      var run = 1
      while (i + run < lens.length && lens(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 3) {
          if (left >= 11) { val take = math.min(left, 138); rle += ((18, take - 11, 7)); left -= take }
          else { val take = math.min(left, 10); rle += ((17, take - 3, 3)); left -= take }
        }
        (0 until left).foreach(_ => rle += ((0, 0, 0)))
      } else {
        rle += ((v, 0, 0))
        var left = run - 1
        while (left >= 3) { val take = math.min(left, 6); rle += ((16, take - 3, 2)); left -= take }
        (0 until left).foreach(_ => rle += ((v, 0, 0)))
      }
      i += run
    }
    val clFreq = new Array[Long](19)
    rle.foreach(t => clFreq(t._1) += 1)
    val clLens = huffLengths(clFreq, 7)
    // single-symbol code-length code: force length 1 (only bit 0 is ever
    // written; the walk table resolves it)
    if (clLens.count(_ > 0) == 1) clLens(clLens.indexWhere(_ > 0)) = 1
    val clCodes = canonicalCodes(clLens)
    var numCl = ClOrder.length
    while (numCl > 4 && clLens(ClOrder(numCl - 1)) == 0) numCl -= 1
    bw.bits(numCl - 4, 4)
    (0 until numCl).foreach(k => bw.bits(clLens(ClOrder(k)), 3))
    bw.bits(0, 1) // no explicit max_symbol
    rle.foreach { case (sym, extra, extraBits) =>
      bw.code(clCodes(sym), clLens(sym))
      if (extraBits > 0) bw.bits(extra, extraBits)
    }
    true
  }

  /** Read one prefix code header + lengths (mirror of the writer). */
  private def readPrefixCode(r: BitReader, alphabet: Int): PrefixCode = {
    if (r.one() == 1) { // simple
      val numSym = r.one() + 1
      val firstLen = if (r.one() == 1) 8 else 1
      val s0 = r.bits(firstLen)
      if (numSym == 1) new PrefixCode(s0, Array.empty)
      else {
        val s1 = r.bits(8)
        val lens = new Array[Int](alphabet)
        require(s0 < alphabet && s1 < alphabet, "webp: simple symbol out of range")
        lens(s0) = 1; lens(s1) = 1
        // canonicalCodes assigns code 0 by SYMBOL order, the simple form
        // assigns it to the FIRST-READ symbol — they agree iff s0 < s1;
        // otherwise SwappedPair inverts the walk
        if (s0 < s1) new PrefixCode(-1, lens)
        else new SwappedPair(s0, s1, alphabet)
      }
    } else {
      val numCl = r.bits(4) + 4
      val clLens = new Array[Int](19)
      (0 until numCl).foreach(k => clLens(ClOrder(k)) = r.bits(3))
      require(!(r.one() == 1), "webp: explicit max_symbol not implemented")
      val clCode = new PrefixCode(-1, clLens)
      val lens = new Array[Int](alphabet)
      var i = 0
      var prev = 8
      while (i < alphabet) {
        val s = clCode.read(r)
        s match {
          case v if v < 16 =>
            lens(i) = v; i += 1
            if (v != 0) prev = v
          case 16 =>
            val rep = 3 + r.bits(2)
            (0 until rep).foreach { _ => lens(i) = prev; i += 1 }
          case 17 =>
            i += 3 + r.bits(3)
          case 18 =>
            i += 11 + r.bits(7)
        }
        require(i <= alphabet, "webp: code lengths overrun alphabet")
      }
      new PrefixCode(-1, lens)
    }
  }

  /** 2-symbol simple code whose first-read symbol is the LARGER one —
    * code 0 belongs to it, inverting the canonical symbol order. */
  private final class SwappedPair(s0: Int, s1: Int, alphabet: Int)
      extends PrefixCode(-1, { val l = new Array[Int](alphabet); l(math.min(s0, s1)) = 1; l(math.max(s0, s1)) = 1; l }) {
    override def read(r: BitReader): Int = if (r.one() == 0) s0 else s1
  }

  // ------------------------------------------------------------ common

  private def prefixEncode(v: Int): (Int, Int, Int) = {
    val n = v - 1
    if (n < 4) (n, 0, 0)
    else {
      val hb = 31 - Integer.numberOfLeadingZeros(n)
      val sb = (n >> (hb - 1)) & 1
      (2 * hb + sb, hb - 1, n & ((1 << (hb - 1)) - 1))
    }
  }

  private def prefixDecode(c: Int, r: BitReader): Int =
    if (c < 4) c + 1
    else {
      val extra = (c - 2) >> 1
      val offset = (2 + (c & 1)) << extra
      offset + r.bits(extra) + 1
    }

  private def cacheSlot(argb: Int, bits: Int): Int =
    (CacheMul * argb) >>> (32 - bits)

  // ------------------------------------------------------------ encode

  private val MinRun = 4
  private val MaxRun = 4096

  /** Encode an ARGB image as a lossless VP8L stream inside a RIFF/WEBP
    * container. `cacheBits` 0 disables the color cache; `subtractGreen`
    * plants the transform leg. Tokenization: distance-1 runs >= 4 become
    * LZ77 backward references, cache hits become cache tokens, the rest
    * literals — all three token families appear on any fixture with
    * repeated rows, so the decoder legs are value-load-bearing. */
  def encode(w: Int, h: Int, argb: Array[Int],
             subtractGreen: Boolean = false, cacheBits: Int = 0): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384, s"webp: dims $w x $h")
    require(argb.length == w * h, "webp: pixel count")
    require(cacheBits >= 0 && cacheBits <= 11, s"webp: cacheBits $cacheBits")
    val px =
      if (!subtractGreen) argb
      else argb.map { p =>
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff000000) | (r << 16) | (g << 8) | b
      }
    val n = px.length
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    // tokens: (0, argb, 0) literal | (1, idx, 0) cache | (2, len, dist)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < n) {
      var run = 0
      if (i > 0) {
        while (i + run < n && px(i + run) == px(i - 1) && run < MaxRun) run += 1
      }
      if (run >= MinRun) {
        tokens += ((2, run, 1))
        if (cacheBits > 0) {
          var k = 0
          while (k < run) { cache(cacheSlot(px(i + k), cacheBits)) = px(i + k); k += 1 }
        }
        i += run
      } else if (cacheBits > 0 && cache(cacheSlot(px(i), cacheBits)) == px(i)) {
        tokens += ((1, cacheSlot(px(i), cacheBits), 0))
        i += 1
      } else {
        tokens += ((0, px(i), 0))
        if (cacheBits > 0) cache(cacheSlot(px(i), cacheBits)) = px(i)
        i += 1
      }
    }
    // histograms
    val greenF = new Array[Long](256 + 24 + cacheSize)
    val redF = new Array[Long](256)
    val blueF = new Array[Long](256)
    val alphaF = new Array[Long](256)
    val distF = new Array[Long](40)
    tokens.foreach {
      case (0, p, _) =>
        greenF((p >> 8) & 0xff) += 1; redF((p >> 16) & 0xff) += 1
        blueF(p & 0xff) += 1; alphaF((p >>> 24) & 0xff) += 1
      case (1, idx, _) => greenF(280 + idx) += 1
      case (_, len, dist) =>
        greenF(256 + prefixEncode(len)._1) += 1
        distF(prefixEncode(dist + 120)._1) += 1
    }
    if (distF.forall(_ == 0)) distF(0) = 1 // unused tree still needs a code
    Seq(redF, blueF, alphaF).foreach(f => if (f.forall(_ == 0)) f(0) = 1)
    val greenL = huffLengths(greenF, 15)
    val redL = huffLengths(redF, 15)
    val blueL = huffLengths(blueF, 15)
    val alphaL = huffLengths(alphaF, 15)
    val distL = huffLengths(distF, 15)
    def codesOf(l: Array[Int]) = canonicalCodes(l)
    val (greenC, redC, blueC, alphaC, distC) =
      (codesOf(greenL), codesOf(redL), codesOf(blueL), codesOf(alphaL), codesOf(distL))
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version
    if (subtractGreen) { bw.bits(1, 1); bw.bits(2, 2) }
    bw.bits(0, 1) // no (more) transforms
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) }
    else bw.bits(0, 1)
    bw.bits(0, 1) // no meta prefix image
    // a tree's token emission must mirror what its HEADER form makes the
    // decoder read: zero bits for the simple 1-symbol form, the walk bits
    // for everything else — including a normal-form single-symbol tree
    // (length-1 code 0), where skipping the write desyncs the stream
    val readsBits = Seq(greenL, redL, blueL, alphaL, distL)
      .map(l => l -> writePrefixCode(bw, l)).toMap
    def emit(c: Array[Int], l: Array[Int], s: Int): Unit =
      if (readsBits(l)) bw.code(c(s), l(s))
    tokens.foreach {
      case (0, p, _) =>
        emit(greenC, greenL, (p >> 8) & 0xff)
        emit(redC, redL, (p >> 16) & 0xff)
        emit(blueC, blueL, p & 0xff)
        emit(alphaC, alphaL, (p >>> 24) & 0xff)
      case (1, idx, _) => emit(greenC, greenL, 280 + idx)
      case (_, len, dist) =>
        val (lc, leb, lev) = prefixEncode(len)
        emit(greenC, greenL, 256 + lc)
        if (leb > 0) bw.bits(lev, leb)
        val (dc, deb, dev) = prefixEncode(dist + 120)
        emit(distC, distL, dc)
        if (deb > 0) bw.bits(dev, deb)
    }
    val vp8l = bw.result()
    // RIFF container: RIFF size covers "WEBP" + chunk header + payload(+pad)
    val pad = vp8l.length & 1
    val riffSize = 4 + 8 + vp8l.length + pad
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(riffSize)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('L')
    le32(vp8l.length)
    out.write(vp8l, 0, vp8l.length)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode a RIFF/WEBP/VP8L payload to (w, h, ARGB pixels). Lossy VP8 /
    * extended VP8X reject loudly; within VP8L the honest-subset gaps
    * (other transforms, meta prefix images, 2D distance map) throw. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(payload.length >= 20, "webp: truncated container")
    def four(p: Int) = new String(payload, p, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    require(four(0) == "RIFF" && four(8) == "WEBP", "webp: not a RIFF/WEBP file")
    val chunk = four(12)
    if (chunk == "VP8 " || chunk == "VP8X")
      throw new IllegalArgumentException(
        s"webp: '$chunk' (lossy/extended) not implemented — VP8L only")
    require(chunk == "VP8L", s"webp: unexpected chunk '$chunk'")
    val csize = (payload(16) & 0xff) | ((payload(17) & 0xff) << 8) |
      ((payload(18) & 0xff) << 16) | ((payload(19) & 0xff) << 24)
    require(20 + csize <= payload.length, "webp: chunk overruns file")
    val r = new BitReader(payload, 20)
    require(r.bits(8) == 0x2f, "webp: bad VP8L signature")
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    r.bits(1) // alpha hint
    require(r.bits(3) == 0, "webp: VP8L version != 0")
    var subtractGreen = false
    while (r.one() == 1) {
      r.bits(2) match {
        case 2 => subtractGreen = true
        case t => throw new IllegalArgumentException(
          s"webp: transform $t not implemented (subtract-green only)")
      }
    }
    val cacheBits = if (r.one() == 1) r.bits(4) else 0
    require(cacheBits <= 11, s"webp: cacheBits $cacheBits out of range")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    require(r.one() == 0, "webp: meta prefix images not implemented")
    val green = readPrefixCode(r, 256 + 24 + cacheSize)
    val red = readPrefixCode(r, 256)
    val blue = readPrefixCode(r, 256)
    val alpha = readPrefixCode(r, 256)
    val dist = readPrefixCode(r, 40)
    val n = w * h
    val out = new Array[Int](n)
    val cache = new Array[Int](math.max(cacheSize, 1))
    var i = 0
    while (i < n) {
      val s = green.read(r)
      if (s < 256) {
        val rr = red.read(r)
        val bb = blue.read(r)
        val aa = alpha.read(r)
        val p = (aa << 24) | (rr << 16) | (s << 8) | bb
        out(i) = p
        if (cacheBits > 0) cache(cacheSlot(p, cacheBits)) = p
        i += 1
      } else if (s < 280) {
        val len = prefixDecode(s - 256, r)
        val d0 = prefixDecode(dist.read(r), r)
        if (d0 <= 120) throw new IllegalArgumentException(
          "webp: 2D distance map (codes 1..120) not implemented")
        val d = d0 - 120
        require(d <= i && i + len <= n, s"webp: backref out of range at $i")
        var k = 0
        while (k < len) {
          val p = out(i + k - d)
          out(i + k) = p
          if (cacheBits > 0) cache(cacheSlot(p, cacheBits)) = p
          k += 1
        }
        i += len
      } else {
        val idx = s - 280
        require(idx < cacheSize, s"webp: cache index $idx out of range")
        out(i) = cache(idx)
        i += 1
      }
    }
    val res =
      if (!subtractGreen) out
      else out.map { p =>
        val g = (p >> 8) & 0xff
        val rr = (((p >> 16) & 0xff) + g) & 0xff
        val bb = ((p & 0xff) + g) & 0xff
        (p & 0xff000000) | (rr << 16) | (g << 8) | bb
      }
    (w, h, res)
  }
}
