package graft.ops

/** REAL FLAC codec — pure-JVM bit-level encode/decode of the FLAC stream
  * layout (RFC 9639 / the published xiph format spec): `fLaC` marker,
  * STREAMINFO metadata block, fixed-blocksize frames with CRC-8-guarded
  * headers and CRC-16-guarded footers, CONSTANT / VERBATIM / FIXED
  * subframes (predictor orders 0–4), SUBFRAME_LPC (Levinson-Durbin
  * coefficients quantized to 12-bit ints, 64-bit prediction accumulator,
  * explicit shift — the subframe type real encoders emit on real audio),
  * and Rice-coded residuals with the 5-bit-width escape. 16-bit
  * mono/stereo — the fixture's shape; the frame and subframe machinery is
  * the real format's.
  *
  * Why this matters for the pipeline: FLAC is the most common LOSSLESS
  * audio format in scraped corpora, and unlike the perceptual families
  * (MP3/AAC — still honestly stubbed behind FakeDecoder) its core is pure
  * integer arithmetic: fixed polynomial predictors + Rice entropy coding,
  * genuinely implementable without native codec libraries — the audio twin
  * of what PNG did for images. Losslessness is the oracle contract:
  * decode(encode(s)) == s bit-for-bit, so the DuckDB oracle replays signal
  * stats from the text fixture exactly like mm_decode_wav.
  *
  * Loud-failure contract (same stance as JpegCodec/GifCodec): bad sync,
  * CRC-8/CRC-16 mismatch, reserved codes, or truncation all throw — a
  * foreign conforming stream outside the implemented subset (non-16-bit,
  * variable blocksize, wasted bits) is rejected, never silently
  * mis-decoded.
  */
object FlacCodec {

  /** Frame block size used by [[encode]] (any value is legal on the wire —
    * the header carries an explicit 16-bit blocksize-1). Small enough that
    * corpus-sized clips span several frames, exercising the UTF-8 frame
    * numbers and per-frame predictor choice. */
  val DefaultBlockSize = 256

  // ------------------------------------------------------------- bit I/O

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { buf.write(cur); cur = 0; n = 0 }
    }
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeBytes(bs: Array[Byte]): Unit = bs.foreach(b => write(b & 0xffL, 8))
    def align(): Unit = while (n != 0) writeBit(0)
    def toBytes: Array[Byte] = { require(n == 0, "unaligned"); buf.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      require(pos < bytes.length, "FLAC: truncated stream")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def read(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
  }

  // ---------------------------------------------------------------- CRCs

  /** CRC-8, poly x^8+x^2+x+1 (0x07 MSB-first), init 0 — the frame-header
    * CRC of the spec. */
  def crc8(bs: Array[Byte], until: Int): Int = {
    var crc = 0
    var i = 0
    while (i < until) {
      crc ^= bs(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005 MSB-first), init 0 — the
    * whole-frame CRC of the spec. */
  def crc16(bs: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bs(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------- fixed predictors

  /** Residuals of fixed predictor `order` over `s[from until untl)`,
    * warm-up taken from preceding samples (RFC 9639 §9.2.2 polynomials). */
  private def residuals(s: Array[Int], from: Int, untl: Int, order: Int): Array[Int] = {
    val out = new Array[Int](untl - from - order)
    var i = from + order
    while (i < untl) {
      val r = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      out(i - from - order) = r
      i += 1
    }
    out
  }

  /** Inverse: integrate residuals back into samples in place. */
  private def restore(s: Array[Int], from: Int, untl: Int, order: Int,
                      res: Array[Int]): Unit = {
    var i = from + order
    while (i < untl) {
      val r = res(i - from - order)
      s(i) = order match {
        case 0 => r
        case 1 => r + s(i - 1)
        case 2 => r + 2 * s(i - 1) - s(i - 2)
        case 3 => r + 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case 4 => r + 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      i += 1
    }
  }

  // ------------------------------------------------------ Rice residual

  /** Zigzag fold (RFC 9639 §9.2.7): n ≥ 0 → 2n, n < 0 → -2n-1. */
  private def fold(r: Int): Long = if (r >= 0) 2L * r else -2L * r - 1

  private def riceCostBits(res: Array[Int], k: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < res.length) { bits += (fold(res(i)) >>> k) + 1 + k; i += 1 }
    bits
  }

  /** Bits needed to store every residual as two's complement (escape). */
  private def escapeWidth(res: Array[Int]): Int = {
    var w = 1
    var i = 0
    while (i < res.length) {
      val r = res(i)
      // two's complement width for r: smallest n with -2^(n-1) <= r < 2^(n-1)
      var n = 1
      while (!(r >= -(1L << (n - 1)) && r < (1L << (n - 1)))) n += 1
      if (n > w) w = n
      i += 1
    }
    w
  }

  /** Write the residual section (coding method 00, partition order 0 —
    * one partition): best Rice parameter by exact cost scan, or the
    * escape (param 1111, 5-bit width, raw two's complement) when cheaper. */
  private def writeResidual(bw: BitWriter, res: Array[Int]): Unit = {
    bw.write(0, 2) // coding method: 4-bit Rice parameters
    bw.write(0, 4) // partition order 0
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      val c = riceCostBits(res, k)
      if (c < bestBits) { bestBits = c; bestK = k }
      k += 1
    }
    val w = escapeWidth(res)
    if (5L + w.toLong * res.length < bestBits) {
      bw.write(0xf, 4) // escape
      bw.write(w.toLong, 5)
      res.foreach(r => bw.write(r.toLong & ((1L << w) - 1), w))
    } else {
      bw.write(bestK.toLong, 4)
      res.foreach { r =>
        val u = fold(r)
        var q = u >>> bestK
        while (q > 0) { bw.writeBit(0); q -= 1 }
        bw.writeBit(1)
        bw.write(u & ((1L << bestK) - 1), bestK)
      }
    }
  }

  private def readResidual(br: BitReader, n: Int): Array[Int] = {
    require(br.read(2) == 0, "FLAC: only 4-bit Rice coding implemented")
    require(br.read(4) == 0, "FLAC: only partition order 0 implemented")
    val out = new Array[Int](n)
    val p = br.read(4).toInt
    if (p == 0xf) { // escape: 5-bit width, two's complement
      val w = br.read(5).toInt
      var i = 0
      while (i < n) {
        val raw = br.read(w)
        val v = if (w > 0 && (raw & (1L << (w - 1))) != 0) raw - (1L << w) else raw
        out(i) = v.toInt
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val q = br.readUnary().toLong
        val u = (q << p) | br.read(p)
        out(i) = (if ((u & 1) == 0) u >>> 1 else -((u + 1) >>> 1)).toInt
        i += 1
      }
    }
    out
  }

  // --------------------------------------------------- UTF-8 frame number

  /** The spec's UTF-8-style coding of the frame number (§9.1.5). */
  private def writeUtf8Number(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0)
    if (v0 < 0x80) { out.write(v0.toInt); return }
    var n = 2
    while (n <= 6 && v0 >= (1L << (5 * n + 1))) n += 1
    out.write((0xff << (8 - n) & 0xff) | (v0 >>> (6 * (n - 1))).toInt)
    var i = n - 2
    while (i >= 0) {
      out.write(0x80 | ((v0 >>> (6 * i)) & 0x3f).toInt)
      i -= 1
    }
  }

  private def readUtf8Number(br: BitReader): Long = {
    val b0 = br.read(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    require(n >= 1 && n <= 6, "FLAC: bad UTF-8 frame number")
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val b = br.read(8).toInt
      require((b & 0xc0) == 0x80, "FLAC: bad UTF-8 continuation")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  // ---------------------------------------------------------------- encode

  /** Encode 16-bit mono samples as a real FLAC stream. `paddingBlock`
    * inserts a PADDING metadata block between STREAMINFO and the frames —
    * the metadata-walk trap, like the WAV fixture's JUNK chunk. */
  private def streamHeader(sampleRate: Int, channels: Int, totalPerChannel: Long,
                           blockSize: Int, paddingBlock: Boolean)
      : java.io.ByteArrayOutputStream = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(blockSize >= 16 && blockSize <= 0xffff, "bad block size")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (type 0, 34 bytes)
    val si = new BitWriter
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0, 24); si.write(0, 24) // frame sizes unknown
    si.write(sampleRate.toLong, 20)
    si.write(channels.toLong - 1, 3)
    si.write(15, 5) // bits per sample - 1
    si.write(totalPerChannel, 36)
    (0 until 16).foreach(_ => si.write(0, 8)) // MD5 unknown (all zero)
    val siBytes = si.toBytes
    out.write(if (paddingBlock) 0x00 else 0x80) // last-block flag | type 0
    out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)
    if (paddingBlock) {
      out.write(0x81) // last | type 1 (PADDING)
      out.write(0); out.write(0); out.write(8)
      (0 until 8).foreach(_ => out.write(0))
    }
    out
  }

  def encode(sampleRate: Int, samples: Array[Short],
             blockSize: Int = DefaultBlockSize,
             paddingBlock: Boolean = false): Array[Byte] = {
    val out = streamHeader(sampleRate, 1, samples.length.toLong,
      blockSize, paddingBlock)
    val s = samples.map(_.toInt)
    var frame = 0
    var from = 0
    while (from < s.length) {
      val untl = math.min(from + blockSize, s.length)
      val fb = encodeFrame(s, from, untl, frame)
      out.write(fb, 0, fb.length)
      frame += 1
      from = untl
    }
    out.toByteArray
  }

  /** Encode 16-bit STEREO (interleaved L R L R …). The channel assignment
    * CYCLES independent → left/side → side/right → mid/side by frame
    * index, so every decorrelation mode of the spec lives in any
    * multi-frame asset. Decorrelation is exactly invertible in integers:
    * side = L−R fits 17 bits (the spec's widened SIDE subframe), and
    * mid = (L+R)>>1 floors — the side's low bit restores the lost unit —
    * so stereo stays bit-lossless. */
  def encodeStereo(sampleRate: Int, interleaved: Array[Short],
                   blockSize: Int = DefaultBlockSize,
                   paddingBlock: Boolean = false): Array[Byte] = {
    require(interleaved.length % 2 == 0, "stereo needs interleaved L/R pairs")
    val n = interleaved.length / 2
    val out = streamHeader(sampleRate, 2, n.toLong, blockSize, paddingBlock)
    var frame = 0
    var from = 0
    while (from < n) {
      val untl = math.min(from + blockSize, n)
      val bs = untl - from
      val l = Array.tabulate(bs)(i => interleaved(2 * (from + i)).toInt)
      val r = Array.tabulate(bs)(i => interleaved(2 * (from + i) + 1).toInt)
      val mode = frame % 4
      val chanBits = mode match { case 0 => 1; case 1 => 8; case 2 => 9; case _ => 10 }
      val hdrBytes = frameHeaderBytes(bs, frame, chanBits)
      val bw = new BitWriter
      bw.writeBytes(hdrBytes)
      bw.write(crc8(hdrBytes, hdrBytes.length).toLong, 8)
      val side = Array.tabulate(bs)(i => l(i) - r(i))
      mode match {
        case 0 =>
          writeSubframe(bw, l, 0, bs, 16); writeSubframe(bw, r, 0, bs, 16)
        case 1 =>
          writeSubframe(bw, l, 0, bs, 16); writeSubframe(bw, side, 0, bs, 17)
        case 2 =>
          writeSubframe(bw, side, 0, bs, 17); writeSubframe(bw, r, 0, bs, 16)
        case _ =>
          val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
          writeSubframe(bw, mid, 0, bs, 16); writeSubframe(bw, side, 0, bs, 17)
      }
      val fb = finishFrame(bw)
      out.write(fb, 0, fb.length)
      frame += 1
      from = untl
    }
    out.toByteArray
  }

  /** One subframe's bits: constant, else best fixed order by |residual|
    * sum. `bits` is the subframe sample width (17 for a SIDE channel —
    * the spec's stereo-decorrelation width). */
  private def writeSubframe(bw: BitWriter, s: Array[Int], from: Int, untl: Int,
                            bits: Int): Unit = {
    val bs = untl - from
    val allEqual = (from until untl).forall(i => s(i) == s(from))
    if (allEqual) {
      bw.write(0, 1); bw.write(0, 6); bw.write(0, 1) // SUBFRAME_CONSTANT
      bw.write(s(from).toLong & ((1L << bits) - 1), bits)
    } else {
      val maxOrder = math.min(4, bs - 1)
      val best = (0 to maxOrder).minBy { o =>
        residuals(s, from, untl, o).map(r => math.abs(r.toLong)).sum
      }
      bw.write(0, 1); bw.write(8L + best, 6); bw.write(0, 1) // SUBFRAME_FIXED
      (from until from + best).foreach(i =>
        bw.write(s(i).toLong & ((1L << bits) - 1), bits))
      writeResidual(bw, residuals(s, from, untl, best))
    }
  }

  // ------------------------------------------------------------- LPC path

  /** Quantized-coefficient precision used by [[encodeLpc]] (a common real
    * encoder default; any 2..15 is legal on the wire — the subframe header
    * carries precision−1 explicitly). */
  val LpcPrecision = 12

  /** LPC coefficients by autocorrelation + Levinson-Durbin (the classic
    * public recipe every FLAC encoder uses). None when the normal
    * equations are degenerate (zero/constant signal, non-positive
    * prediction error) — callers fall back to a FIXED subframe. Encoder
    *-side only: any coefficient choice yields a lossless stream because
    * residuals are computed from the QUANTIZED integer predictor. */
  private def lpcCoefficients(
      s: Array[Int], from: Int, untl: Int, order: Int): Option[Array[Double]] = {
    val autoc = Array.tabulate(order + 1) { lag =>
      var acc = 0.0
      var i = from + lag
      while (i < untl) { acc += s(i).toDouble * s(i - lag); i += 1 }
      acc
    }
    if (autoc(0) <= 0.0) return None
    val lpc = new Array[Double](order)
    var err = autoc(0)
    var j = 0
    while (j < order) {
      var k = autoc(j + 1)
      var i = 0
      while (i < j) { k -= lpc(i) * autoc(j - i); i += 1 }
      k /= err
      // reflection update: lpc'[i] = lpc[i] - k*lpc[j-1-i], symmetric pairs
      var lo = 0
      var hi = j - 1
      while (lo < hi) {
        val a = lpc(lo); val b = lpc(hi)
        lpc(lo) = a - k * b
        lpc(hi) = b - k * a
        lo += 1; hi -= 1
      }
      if (lo == hi) lpc(lo) -= k * lpc(lo)
      lpc(j) = k
      err *= 1.0 - k * k
      if (err <= 0.0) return None
      j += 1
    }
    Some(lpc)
  }

  /** Quantize doubles to `precision`-bit signed ints with the largest
    * shift (≤ 15) that keeps every coefficient in range. */
  private def quantizeLpc(lpc: Array[Double], precision: Int): (Array[Int], Int) = {
    val lim = (1 << (precision - 1)) - 1
    val cmax = lpc.map(math.abs).max
    if (cmax <= 0.0) return (new Array[Int](lpc.length), 0)
    var shift = 0
    while (shift < 15 && cmax * (1L << (shift + 1)).toDouble <= lim) shift += 1
    val q = lpc.map { c =>
      math.max(-lim - 1, math.min(lim, math.round(c * (1L << shift)).toInt))
    }
    (q, shift)
  }

  /** Residuals of the quantized predictor — the encoder twin of the
    * decoder's reconstruction, so losslessness is algebraic. */
  private def lpcResiduals(s: Array[Int], from: Int, untl: Int,
                           coefs: Array[Int], shift: Int): Array[Int] = {
    val order = coefs.length
    val out = new Array[Int](untl - from - order)
    var i = from + order
    while (i < untl) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
      out(i - from - order) = s(i) - (acc >> shift).toInt
      i += 1
    }
    out
  }

  /** One SUBFRAME_LPC at the given order (constant blocks still emit
    * SUBFRAME_CONSTANT; degenerate normal equations or an all-zero
    * quantization fall back to the FIXED chooser — both spec-legal and
    * still lossless). */
  private def writeLpcSubframe(bw: BitWriter, s: Array[Int], from: Int,
                               untl: Int, bits: Int, order: Int): Unit = {
    val bs = untl - from
    val allEqual = (from until untl).forall(i => s(i) == s(from))
    val ord = math.min(order, bs - 1)
    if (allEqual || ord < 1) { writeSubframe(bw, s, from, untl, bits); return }
    lpcCoefficients(s, from, untl, ord) match {
      case Some(lpc) =>
        val (q, shift) = quantizeLpc(lpc, LpcPrecision)
        if (q.forall(_ == 0)) { writeSubframe(bw, s, from, untl, bits); return }
        bw.write(0, 1); bw.write(32L | (ord - 1), 6); bw.write(0, 1)
        (from until from + ord).foreach(i =>
          bw.write(s(i).toLong & ((1L << bits) - 1), bits))
        bw.write(LpcPrecision.toLong - 1, 4)
        bw.write(shift.toLong, 5)
        q.foreach(c =>
          bw.write(c.toLong & ((1L << LpcPrecision) - 1), LpcPrecision))
        writeResidual(bw, lpcResiduals(s, from, untl, q, shift))
      case None => writeSubframe(bw, s, from, untl, bits)
    }
  }

  /** Encode 16-bit mono with SUBFRAME_LPC frames — the path real encoders
    * take on real audio. The LPC order CYCLES 1..8 by frame index, so a
    * multi-frame asset exercises every order's warm-up/coefficient/
    * prediction shape. Lossless like [[encode]]: same stream layout, only
    * the subframe type differs. */
  def encodeLpc(sampleRate: Int, samples: Array[Short],
                blockSize: Int = DefaultBlockSize,
                paddingBlock: Boolean = false): Array[Byte] = {
    val out = streamHeader(sampleRate, 1, samples.length.toLong,
      blockSize, paddingBlock)
    val s = samples.map(_.toInt)
    var frame = 0
    var from = 0
    while (from < s.length) {
      val untl = math.min(from + blockSize, s.length)
      val hdrBytes = frameHeaderBytes(untl - from, frame, 0)
      val bw = new BitWriter
      bw.writeBytes(hdrBytes)
      bw.write(crc8(hdrBytes, hdrBytes.length).toLong, 8)
      writeLpcSubframe(bw, s, from, untl, 16, order = 1 + frame % 8)
      val fb = finishFrame(bw)
      out.write(fb, 0, fb.length)
      frame += 1
      from = untl
    }
    out.toByteArray
  }

  private def frameHeaderBytes(bs: Int, frameNo: Int, chanBits: Int): Array[Byte] = {
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(0xff); hdr.write(0xf8) // sync 11111111 111110, reserved 0, fixed-blocksize 0
    hdr.write(0x70)                  // blocksize: 0111 (16-bit at end); rate: 0000 (STREAMINFO)
    hdr.write((chanBits << 4) | 0x08) // channel assignment; size 100 (16-bit); reserved 0
    writeUtf8Number(hdr, frameNo.toLong)
    hdr.write((bs - 1) >> 8); hdr.write((bs - 1) & 0xff)
    hdr.toByteArray
  }

  private def finishFrame(bw: BitWriter): Array[Byte] = {
    bw.align()
    val frameBytes = bw.toBytes
    val c16 = crc16(frameBytes, 0, frameBytes.length)
    val res = java.util.Arrays.copyOf(frameBytes, frameBytes.length + 2)
    res(frameBytes.length) = (c16 >> 8).toByte
    res(frameBytes.length + 1) = (c16 & 0xff).toByte
    res
  }

  private def encodeFrame(s: Array[Int], from: Int, untl: Int, frameNo: Int): Array[Byte] = {
    val bs = untl - from
    val hdrBytes = frameHeaderBytes(bs, frameNo, 0) // mono
    val bw = new BitWriter
    bw.writeBytes(hdrBytes)
    bw.write(crc8(hdrBytes, hdrBytes.length).toLong, 8)
    writeSubframe(bw, s, from, untl, 16)
    finishFrame(bw)
  }

  // ---------------------------------------------------------------- decode

  /** Decode a FLAC stream produced by any encoder within the implemented
    * subset. Returns (sampleRate, channels, samples). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    require(payload.length >= 4 + 4 + 34, "FLAC: truncated stream")
    require(payload(0) == 'f' && payload(1) == 'L' &&
      payload(2) == 'a' && payload(3) == 'C', "not a FLAC payload")
    var pos = 4
    var last = false
    var rate = -1
    var total = -1L
    var blockMax = -1
    var channels = 1
    while (!last) {
      require(pos + 4 <= payload.length, "FLAC: truncated metadata header")
      val h = payload(pos) & 0xff
      last = (h & 0x80) != 0
      val tpe = h & 0x7f
      val len = ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= payload.length, "FLAC: truncated metadata block")
      if (tpe == 0) {
        require(len == 34, "FLAC: bad STREAMINFO length")
        val br = new BitReader(payload, pos)
        br.read(16) // min blocksize
        blockMax = br.read(16).toInt
        br.read(24); br.read(24)
        rate = br.read(20).toInt
        val ch = br.read(3).toInt + 1
        val bps = br.read(5).toInt + 1
        require((ch == 1 || ch == 2) && bps == 16,
          s"FLAC: only 16-bit mono/stereo implemented (got $ch ch / $bps bit)")
        channels = ch
        total = br.read(36)
      }
      pos += len
    }
    require(rate > 0 && total >= 0, "FLAC: missing STREAMINFO")
    val out = new Array[Short](total.toInt * channels)
    var got = 0
    while (got < total) {
      val br = new BitReader(payload, pos)
      val frameStart = pos
      require(br.read(14) == 0x3ffe, "FLAC: bad frame sync")
      require(br.read(1) == 0, "FLAC: reserved bit set")
      require(br.read(1) == 0, "FLAC: only fixed-blocksize streams implemented")
      val bsCode = br.read(4).toInt
      val rateCode = br.read(4).toInt
      require(rateCode == 0, "FLAC: only STREAMINFO-rate frames implemented")
      val chanAsn = br.read(4).toInt
      require(br.read(3) == 4, "FLAC: only 16-bit frames implemented")
      require(br.read(1) == 0, "FLAC: reserved bit set")
      readUtf8Number(br)
      val bs = bsCode match {
        case 6 => br.read(8).toInt + 1
        case 7 => br.read(16).toInt + 1
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException("FLAC: reserved blocksize code")
      }
      require(got + bs <= total,
        s"FLAC: frame block size $bs overruns STREAMINFO total $total")
      require(br.aligned, "FLAC: header must be byte-aligned before CRC-8")
      val hdrCrc = br.read(8).toInt
      require(hdrCrc == crc8(payload.slice(frameStart, br.bytePos - 1),
        br.bytePos - 1 - frameStart), "FLAC: frame header CRC-8 mismatch")
      // subframes per the channel assignment (§9.1.3): SIDE channels carry
      // one extra bit; decorrelation inverts after both subframes decode
      val chans: Array[Array[Int]] = chanAsn match {
        case 0 => // mono
          require(channels == 1, "FLAC: mono frame in stereo stream")
          Array(readSubframe(br, bs, 16))
        case 1 => // independent stereo
          require(channels == 2, "FLAC: stereo frame in mono stream")
          Array(readSubframe(br, bs, 16), readSubframe(br, bs, 16))
        case 8 => // left/side
          require(channels == 2, "FLAC: stereo frame in mono stream")
          val l = readSubframe(br, bs, 16)
          val sd = readSubframe(br, bs, 17)
          Array(l, Array.tabulate(bs)(i => l(i) - sd(i)))
        case 9 => // side/right
          require(channels == 2, "FLAC: stereo frame in mono stream")
          val sd = readSubframe(br, bs, 17)
          val r = readSubframe(br, bs, 16)
          Array(Array.tabulate(bs)(i => r(i) + sd(i)), r)
        case 10 => // mid/side
          require(channels == 2, "FLAC: stereo frame in mono stream")
          val m = readSubframe(br, bs, 16)
          val sd = readSubframe(br, bs, 17)
          val l = Array.tabulate(bs) { i =>
            (((m(i) << 1) | (sd(i) & 1)) + sd(i)) >> 1
          }
          val r = Array.tabulate(bs) { i =>
            (((m(i) << 1) | (sd(i) & 1)) - sd(i)) >> 1
          }
          Array(l, r)
        case a => throw new IllegalArgumentException(
          s"FLAC: channel assignment $a not implemented")
      }
      br.align()
      require(br.bytePos + 2 <= payload.length, "FLAC: truncated frame footer")
      val c16 = crc16(payload, frameStart, br.bytePos)
      val want = ((payload(br.bytePos) & 0xff) << 8) | (payload(br.bytePos + 1) & 0xff)
      require(c16 == want, "FLAC: frame CRC-16 mismatch")
      pos = br.bytePos + 2
      var i = 0
      while (i < bs) {
        var c = 0
        while (c < channels) {
          val v = chans(c)(i)
          require(v >= Short.MinValue && v <= Short.MaxValue,
            "FLAC: sample out of 16-bit range")
          out((got + i) * channels + c) = v.toShort
          c += 1
        }
        i += 1
      }
      got += bs
    }
    (rate, channels, out)
  }

  /** One subframe at the given sample width (17 for SIDE channels). */
  private def readSubframe(br: BitReader, bs: Int, bits: Int): Array[Int] = {
    require(br.readBit() == 0, "FLAC: subframe padding bit set")
    val tpe = br.read(6).toInt
    require(br.readBit() == 0, "FLAC: wasted bits not implemented")
    def sample(): Int = {
      val v = br.read(bits)
      (if ((v & (1L << (bits - 1))) != 0) v - (1L << bits) else v).toInt
    }
    val block = new Array[Int](bs)
    tpe match {
      case 0 => // CONSTANT
        java.util.Arrays.fill(block, sample())
      case 1 => // VERBATIM
        var i = 0
        while (i < bs) { block(i) = sample(); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED, order t-8
        val order = t - 8
        var i = 0
        while (i < order) { block(i) = sample(); i += 1 }
        restore(block, 0, bs, order, readResidual(br, bs - order))
      case t if t >= 32 => // LPC, order (t & 31) + 1 (§9.2.3)
        val order = (t & 31) + 1
        require(order <= bs, "FLAC: LPC order exceeds block size")
        var i = 0
        while (i < order) { block(i) = sample(); i += 1 }
        val precM1 = br.read(4).toInt
        require(precM1 != 0xf, "FLAC: invalid qlp coefficient precision")
        val prec = precM1 + 1
        val shiftRaw = br.read(5).toInt
        // 5-bit two's complement per the spec; negative shifts are
        // spec-forbidden in practice — reject loudly
        val shift = if ((shiftRaw & 0x10) != 0) shiftRaw - 32 else shiftRaw
        require(shift >= 0, "FLAC: negative qlp shift")
        val coefs = Array.fill(order) {
          val v = br.read(prec)
          (if ((v & (1L << (prec - 1))) != 0) v - (1L << prec) else v).toInt
        }
        val res = readResidual(br, bs - order)
        var k = order
        while (k < bs) {
          var acc = 0L // 64-bit accumulator per the spec's width analysis
          var j = 0
          while (j < order) { acc += coefs(j).toLong * block(k - 1 - j); j += 1 }
          block(k) = res(k - order) + (acc >> shift).toInt
          k += 1
        }
      case t => throw new IllegalArgumentException(
        s"FLAC: reserved subframe type $t")
    }
    block
  }

  /** Decode + the same one-pass signal stats as [[WavCodec.decodeFeatures]]
    * — lossless, so a FLAC asset of a signal yields bit-identical stats to
    * its WAV twin. */
  def decodeFeatures(a: MediaAsset): AudioFeatures = {
    val (rate, channels, ss) = decode(a.payload)
    WavCodec.featuresOf(a.asset_id, a.format, rate, channels, ss)
  }
}
