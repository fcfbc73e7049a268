package graft.ops

/** Zstandard (RFC 8878) — FROM-SCRATCH pure-JVM implementation of the one
  * transport a modern dataset dump actually ships (`.jsonl.zst`,
  * `.tar.zst`: Dolma, RedPajama, SlimPajama mirrors are all zstd; the
  * r15 ingestion matrix stopped at DEFLATE — r15 verdict task 1).
  *
  * DECODER: the full RFC 8878 decoding stack, written from the spec —
  * frame header walk (single-segment and windowed, all four FCS widths,
  * dictionary rejection, skippable frames), block loop (Raw / RLE /
  * Compressed), literals section (Raw / RLE / Huffman-compressed /
  * Treeless, 1-stream AND 4-stream, Huffman table from direct 4-bit
  * weights or FSE-compressed weights with the two-state interleaved
  * decode), sequences section (Predefined / RLE / FSE_Compressed / Repeat
  * modes for each of LL/OF/ML, normalized-count table parse, backward
  * interleaved bitstream), sequence execution with the three-slot
  * repeat-offset machinery incl. the `litLen == 0` rotation corner, and
  * the XXH64 content checksum. NOT implemented (loud failure, never
  * silent): dictionaries (`Dictionary_ID != 0` throws).
  *
  * ENCODER (fixture generation, same stance as [[FlacCodec]]/[[GifCodec]]
  * — the decode side is what the queries measure): real COMPRESSED blocks
  * — greedy hash-chain LZ77 match finder, canonical Huffman literals
  * (direct-weight description, 1 stream), sequences under the PREDEFINED
  * FSE distributions with the spec's state-machine encoder run in reverse
  * — plus Raw/RLE blocks where they win, multi-frame concatenation,
  * skippable frames and the content checksum. Every byte the encoder
  * emits goes through this decoder in the spec AND through the reference
  * libzstd (zstd-jni, test-only) — and libzstd's own output (which uses
  * 4-stream literals, FSE-compressed tables and repeat offsets) must
  * decode through THIS decoder, so the two implementations gate each
  * other in both directions.
  *
  * Same loud-failure philosophy as [[GzipCodec]]: every byte of the
  * payload must belong to a valid frame; truncation, bad magic, reserved
  * bits, over-long reads, checksum mismatches and FCS disagreements all
  * throw, never return a partial corpus.
  */
object ZstdCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zstd: $msg")

  // ------------------------------------------------------------- XXH64

  /** XXH64 (Yann Collet's public spec) — zstd's content checksum. */
  def xxh64(buf: Array[Byte], off: Int, len: Int, seed: Long = 0L): Long = {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    def u64(p: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(p + i) & 0xffL) << (8 * i); i += 1 }; v
    }
    def u32l(p: Int): Long = {
      var v = 0L; var i = 0
      while (i < 4) { v |= (buf(p + i) & 0xffL) << (8 * i); i += 1 }; v
    }
    def round(acc: Long, in: Long): Long =
      java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
    var p = off; val end = off + len
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (p + 32 <= end) {
          v1 = round(v1, u64(p)); v2 = round(v2, u64(p + 8))
          v3 = round(v3, u64(p + 16)); v4 = round(v4, u64(p + 24))
          p += 32
        }
        var x = java.lang.Long.rotateLeft(v1, 1) +
          java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) +
          java.lang.Long.rotateLeft(v4, 18)
        def merge(acc: Long, v: Long): Long =
          (acc ^ round(0L, v)) * P1 + P4
        x = merge(x, v1); x = merge(x, v2); x = merge(x, v3); x = merge(x, v4)
        x
      } else seed + P5
    h += len
    while (p + 8 <= end) {
      h = java.lang.Long.rotateLeft(h ^ round(0L, u64(p)), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= end) {
      h = java.lang.Long.rotateLeft(h ^ (u32l(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < end) {
      h = java.lang.Long.rotateLeft(h ^ ((buf(p) & 0xffL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ----------------------------------------------------- bit I/O

  /** BACKWARD bit reader (RFC 8878 §3.1.1.4 bitstream convention): bits
    * were written LSB-first at increasing positions; the reader starts at
    * the 1-sentinel in the last non-zero byte and consumes downward. A
    * multi-bit read returns the consumed bits with the FIRST-consumed bit
    * as the value's MSB — which equals the little-endian slice
    * [pos-n, pos), exactly how the forward writer packed it. */
  private final class RBits(buf: Array[Byte], base: Int, nBytes: Int) {
    var bitPos: Int = {
      var last = base + nBytes - 1
      while (last >= base && buf(last) == 0) last -= 1
      if (last < base) fail("bitstream has no sentinel bit")
      val hb = 31 - Integer.numberOfLeadingZeros(buf(last) & 0xff)
      (last - base) * 8 + hb
    }
    def remaining: Int = bitPos
    /** Strict read: underflow throws. */
    def read(n: Int): Int = {
      if (n == 0) return 0
      if (bitPos < n) fail("bitstream underflow")
      readPad(n)
    }
    /** Permissive read for the Huffman-weight FSE loop and Huffman tail:
      * missing low bits are zero; bitPos goes negative to signal
      * exhaustion (checked by the caller). */
    def readPad(n: Int): Int = {
      bitPos -= n
      var v = 0L
      val p0 = math.max(bitPos, 0)
      var byteIdx = base + (p0 >> 3)
      var i = 0
      while (i < 8 && byteIdx + i < base + nBytes) {
        v |= (buf(byteIdx + i) & 0xffL) << (8 * i); i += 1
      }
      v = v >>> (p0 & 7)
      if (bitPos < 0) v = v << (-bitPos) // zero-pad the missing low bits
      (v & ((1L << n) - 1)).toInt
    }
    def readLong(n: Int): Long =
      if (n <= 24) read(n).toLong & 0xffffffffL
      else {
        // value MSB side is consumed first
        val hi = read(n - 24).toLong & 0xffffffffL
        val lo = read(24).toLong & 0xffffffffL
        (hi << 24) | lo
      }
  }

  /** FORWARD bit reader (FSE table descriptions are read forward,
    * LSB-first within each byte). */
  private final class FBits(buf: Array[Byte], base: Int, nBytes: Int) {
    var bitPos = 0
    def read(n: Int): Int = {
      if (n == 0) return 0
      if (bitPos + n > nBytes * 8) fail("table description overruns its bytes")
      var v = 0L
      var byteIdx = base + (bitPos >> 3)
      var i = 0
      while (i < 8 && byteIdx + i < base + nBytes) {
        v |= (buf(byteIdx + i) & 0xffL) << (8 * i); i += 1
      }
      val out = ((v >>> (bitPos & 7)) & ((1L << n) - 1)).toInt
      bitPos += n
      out
    }
    def bytesConsumed: Int = (bitPos + 7) >> 3
  }

  /** Forward bit WRITER (the encoder side of the backward-read streams):
    * append (value, n) LSB-first, close with the sentinel 1. */
  private final class WBits {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def add(value: Long, n: Int): Unit = {
      require(n >= 0 && n <= 56 && (n == 64 || (value & ~((1L << n) - 1)) == 0),
        s"WBits.add: value ${value} does not fit $n bits")
      acc |= value << nAcc
      nAcc += n
      while (nAcc >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; nAcc -= 8
      }
    }
    def close(): Array[Byte] = {
      add(1L, 1) // sentinel
      if (nAcc > 0) { out.write((acc & 0xff).toInt); acc = 0; nAcc = 0 }
      out.toByteArray
    }
  }

  // ----------------------------------------------------- FSE machinery

  /** One FSE decode-table cell. */
  private final case class FseCell(symbol: Int, nbBits: Int, baseline: Int)

  /** Symbol spread order (RFC 8878 §4.1.1 table-building step): low-prob
    * (-1) symbols at the table's high end, the rest scattered with the
    * prescribed step. Shared by the decode-table and encode-table builds
    * so the two sides can never disagree. */
  private def fseSpread(norm: Array[Int], tableLog: Int): Array[Int] = {
    val size = 1 << tableLog
    val spread = new Array[Int](size)
    var highThreshold = size - 1
    var s = 0
    while (s < norm.length) {
      if (norm(s) == -1) { spread(highThreshold) = s; highThreshold -= 1 }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < norm.length) {
      var i = 0
      while (i < norm(s)) {
        spread(pos) = s
        pos = (pos + step) & mask
        while (pos > highThreshold) pos = (pos + step) & mask
        i += 1
      }
      s += 1
    }
    if (pos != 0) fail("corrupt FSE distribution (spread did not close)")
    spread
  }

  private def fseDecodeTable(norm: Array[Int], tableLog: Int): Array[FseCell] = {
    val size = 1 << tableLog
    val spread = fseSpread(norm, tableLog)
    val symbolNext = norm.map(c => if (c == -1) 1 else c)
    val table = new Array[FseCell](size)
    var t = 0
    while (t < size) {
      val sym = spread(t)
      val x = symbolNext(sym); symbolNext(sym) += 1
      val nbBits = tableLog - (31 - Integer.numberOfLeadingZeros(x))
      table(t) = FseCell(sym, nbBits, (x << nbBits) - size)
      t += 1
    }
    table
  }

  /** Read an FSE normalized-count table description (forward bits).
    * Returns (normCounts, tableLog, bytesConsumed). */
  private def readNCount(buf: Array[Byte], off: Int, maxBytes: Int,
                         maxSymbol: Int, maxLog: Int): (Array[Int], Int, Int) = {
    val in = new FBits(buf, off, maxBytes)
    val tableLog = in.read(4) + 5
    if (tableLog > maxLog) fail(s"FSE accuracy $tableLog exceeds max $maxLog")
    var remaining = (1 << tableLog) + 1
    var threshold = 1 << tableLog
    var nbBits = tableLog + 1
    val norm = Array.newBuilder[Int]
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        var n = in.read(2)
        while (n == 3) { charnum += 3; norm += 0; norm += 0; norm += 0; n = in.read(2) }
        var i = 0
        while (i < n) { norm += 0; i += 1 }
        charnum += n
        previous0 = false
        if (charnum > maxSymbol) fail("FSE description exceeds max symbol")
      } else {
        val max = (2 * threshold - 1) - remaining
        val small = in.read(nbBits - 1)
        var count =
          if (small < max) small
          else {
            val extra = in.read(1)
            val large = small | (extra << (nbBits - 1))
            if (large >= threshold) large - max else large
          }
        count -= 1 // -1 encodes "less than 1" probability
        remaining -= math.abs(count)
        norm += count
        charnum += 1
        previous0 = count == 0
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1; threshold >>= 1
        }
      }
    }
    if (remaining != 1) fail("corrupt FSE normalized counts")
    val counts = norm.result()
    val total = counts.map(c => if (c == -1) 1 else c).sum
    if (total != (1 << tableLog)) fail("FSE counts do not sum to table size")
    (counts, tableLog, in.bytesConsumed)
  }

  // predefined distributions (RFC 8878 §3.1.1.3.2.2)
  private val LLDefaultNorm = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MLDefaultNorm = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1, -1, -1)
  private val OFDefaultNorm = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, -1, -1, -1, -1, -1)
  private val LLDefaultLog = 6
  private val MLDefaultLog = 6
  private val OFDefaultLog = 5

  // LL/ML code tables (RFC 8878 §3.1.1.3.2.1.1)
  private val LLBaseline = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20, 22,
    24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
    32768, 65536)
  private val LLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3,
    3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MLBaseline = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37, 39, 41,
    43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051, 4099, 8195,
    16387, 32771, 65539)
  private val MLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9,
    10, 11, 12, 13, 14, 15, 16)

  // ----------------------------------------------------- Huffman decode

  /** Canonical Huffman decode table from weights (RFC 8878 §4.2.1):
    * ranges assigned by ascending weight, within a weight by symbol
    * order. Returns (table of (symbol, nbBits), tableLog). */
  private def hufDecodeTable(weights: Array[Int]): (Array[Int], Array[Int], Int) = {
    var total = 0L
    weights.foreach { w =>
      if (w < 0 || w > 11) fail(s"huffman weight $w out of range")
      if (w > 0) total += 1L << (w - 1)
    }
    if (total == 0) fail("huffman table with no symbols")
    // tableLog = highbit(total) + 1: the implied last weight always adds
    // at least one share, so the full tree needs the NEXT power of two
    // even when the transmitted total is itself a power of two
    val tableLog = (63 - java.lang.Long.numberOfLeadingZeros(total)).toInt + 1
    if (tableLog > 11) fail(s"huffman tableLog $tableLog exceeds 11")
    val left = (1L << tableLog) - total
    // the implied LAST weight must complete the tree exactly: left must be
    // a power of two (it is the last symbol's 2^(w-1) share)
    if (left <= 0 || (left & (left - 1)) != 0) fail("corrupt huffman weights")
    val lastW = java.lang.Long.numberOfTrailingZeros(left).toInt + 1
    val all = weights :+ lastW
    val size = 1 << tableLog
    val symTab = new Array[Int](size)
    val bitsTab = new Array[Int](size)
    // rank starts: weight 1 first (longest codes)
    val maxW = all.max
    val rankVal = new Array[Int](maxW + 2)
    var pos = 0
    var w = 1
    while (w <= maxW) {
      rankVal(w) = pos
      var s = 0
      while (s < all.length) {
        if (all(s) == w) pos += 1 << (w - 1)
        s += 1
      }
      w += 1
    }
    if (pos != size) fail("huffman weights do not fill the table")
    var s = 0
    while (s < all.length) {
      val ws = all(s)
      if (ws > 0) {
        val len = 1 << (ws - 1)
        val start = rankVal(ws)
        var i = 0
        while (i < len) {
          symTab(start + i) = s; bitsTab(start + i) = tableLog + 1 - ws; i += 1
        }
        rankVal(ws) += len
      }
      s += 1
    }
    (symTab, bitsTab, tableLog)
  }

  /** Huffman weights from the table description at buf[off..]: direct
    * 4-bit representation (headerByte >= 128) or FSE-compressed
    * (headerByte < 128, two-state interleaved decode per §4.2.1.2).
    * Returns (weights EXCLUDING the implied last, bytesConsumed incl.
    * header byte). */
  private def readHufWeights(buf: Array[Byte], off: Int, maxBytes: Int): (Array[Int], Int) = {
    if (maxBytes < 1) fail("truncated huffman description")
    val header = buf(off) & 0xff
    if (header >= 128) {
      val n = header - 127
      val nBytes = (n + 1) / 2
      if (1 + nBytes > maxBytes) fail("truncated huffman weights")
      val ws = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = buf(off + 1 + i / 2) & 0xff
        ws(i) = if (i % 2 == 0) b >> 4 else b & 0xf
        i += 1
      }
      (ws, 1 + nBytes)
    } else {
      val compSize = header
      if (1 + compSize > maxBytes) fail("truncated huffman FSE weights")
      val (norm, tlog, hdrBytes) =
        readNCount(buf, off + 1, compSize, maxSymbol = 255, maxLog = 6)
      val table = fseDecodeTable(norm, tlog)
      val bits = new RBits(buf, off + 1 + hdrBytes, compSize - hdrBytes)
      var st1 = bits.read(tlog)
      var st2 = bits.read(tlog)
      val ws = Array.newBuilder[Int]
      var n = 0
      var done = false
      while (!done) {
        if (n > 255) fail("huffman weight stream too long")
        val c1 = table(st1)
        ws += c1.symbol; n += 1
        st1 = c1.baseline + bits.readPad(c1.nbBits)
        if (bits.bitPos < 0) { ws += table(st2).symbol; n += 1; done = true }
        else {
          val c2 = table(st2)
          ws += c2.symbol; n += 1
          st2 = c2.baseline + bits.readPad(c2.nbBits)
          if (bits.bitPos < 0) { ws += table(st1).symbol; n += 1; done = true }
        }
      }
      (ws.result(), 1 + compSize)
    }
  }

  /** Decode one Huffman stream of exactly `outLen` symbols; the stream
    * must be consumed exactly. */
  private def hufDecodeStream(
      buf: Array[Byte], off: Int, nBytes: Int,
      symTab: Array[Int], bitsTab: Array[Int], tableLog: Int,
      out: Array[Byte], outOff: Int, outLen: Int): Unit = {
    val bits = new RBits(buf, off, nBytes)
    var produced = 0
    while (produced < outLen) {
      // peek tableLog bits (zero-padded at the tail), consume entry bits
      val save = bits.bitPos
      val idx = bits.readPad(tableLog)
      val nb = bitsTab(idx)
      bits.bitPos = save - nb
      if (bits.bitPos < 0) fail("huffman stream underflow")
      out(outOff + produced) = symTab(idx).toByte
      produced += 1
    }
    if (bits.bitPos != 0) fail("huffman stream not fully consumed")
  }

  // ----------------------------------------------------- output buffer

  /** Growable frame-output buffer with direct self-copy — the sequence
    * executor appends literals and match copies straight into the frame
    * so a match offset reaches any earlier byte of the SAME frame without
    * materializing per-block or per-sequence copies (a
    * ByteArrayOutputStream formulation re-copied the whole frame per
    * block AND the block per sequence — quadratic on sequence-heavy
    * blocks, and this is the hot decode path). */
  private final class ByteBuf(initial: Int) {
    var buf = new Array[Byte](math.max(initial, 64))
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var c = buf.length
        while (c < len + n) c = c << 1
        buf = java.util.Arrays.copyOf(buf, c)
      }
    def append(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, buf, len, n); len += n
    }
    def appendFill(b: Byte, n: Int): Unit = {
      ensure(n); java.util.Arrays.fill(buf, len, len + n, b); len += n
    }
    /** Overlap-safe match copy from `len - offset` (byte-at-a-time by the
      * format's semantics: offset < n repeats the copied prefix). */
    def selfCopy(offset: Int, n: Int): Unit = {
      ensure(n)
      var k = 0
      while (k < n) { buf(len + k) = buf(len - offset + k); k += 1 }
      len += n
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  // ----------------------------------------------------- frame state

  /** Tables that persist across blocks within one frame (Repeat modes /
    * Treeless literals / repeat offsets). */
  private final class FrameState {
    var hufSym: Array[Int] = null
    var hufBits: Array[Int] = null
    var hufLog: Int = 0
    var llTable: Array[FseCell] = null
    var ofTable: Array[FseCell] = null
    var mlTable: Array[FseCell] = null
    var rep1: Long = 1L; var rep2: Long = 4L; var rep3: Long = 8L
  }

  // ----------------------------------------------------- decode

  /** Decoded result: the concatenated content of all frames, plus frame
    * accounting for fixture arithmetic. */
  final case class ZstdDecoded(bytes: Array[Byte], nFrames: Int, nSkippable: Int)

  /** Decode ALL frames of a (possibly multi-frame) zstd payload. Every
    * byte must belong to a valid frame — trailing garbage throws. */
  def decode(payload: Array[Byte]): ZstdDecoded = {
    if (payload.isEmpty) fail("empty payload")
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var nFrames = 0
    var nSkip = 0
    def u32(p: Int): Long = {
      if (p + 4 > payload.length) fail("truncated u32")
      ((payload(p) & 0xffL)) | ((payload(p + 1) & 0xffL) << 8) |
        ((payload(p + 2) & 0xffL) << 16) | ((payload(p + 3) & 0xffL) << 24)
    }
    while (pos < payload.length) {
      val magic = u32(pos)
      if ((magic & 0xfffffff0L) == 0x184D2A50L) { // skippable frame
        val size = u32(pos + 4)
        if (pos + 8 + size > payload.length) fail("skippable frame overruns payload")
        pos += 8 + size.toInt
        nSkip += 1
      } else if (magic == 0xFD2FB528L) {
        pos = decodeFrame(payload, pos + 4, out)
        nFrames += 1
      } else fail(f"bad frame magic 0x$magic%08x at $pos")
    }
    ZstdDecoded(out.toByteArray, nFrames, nSkip)
  }

  /** Convenience face: decoded bytes only. */
  def decompress(payload: Array[Byte]): Array[Byte] = decode(payload).bytes

  private def decodeFrame(buf: Array[Byte], start: Int,
                          out: java.io.ByteArrayOutputStream): Int = {
    var pos = start
    def byteAt(p: Int): Int = {
      if (p >= buf.length) fail("truncated frame header"); buf(p) & 0xff
    }
    val fhd = byteAt(pos); pos += 1
    val fcsFlag = fhd >> 6
    val singleSegment = (fhd & 0x20) != 0
    if ((fhd & 0x08) != 0) fail("reserved FHD bit set")
    val hasChecksum = (fhd & 0x04) != 0
    val dictIdFlag = fhd & 0x03
    var windowSize = 0L
    if (!singleSegment) {
      val wd = byteAt(pos); pos += 1
      val exp = wd >> 3
      val mantissa = wd & 7
      val base = 1L << (10 + exp)
      windowSize = base + (base / 8) * mantissa
    }
    val dictBytes = dictIdFlag match {
      case 0 => 0; case 1 => 1; case 2 => 2; case 3 => 4
    }
    var dictId = 0L
    var i = 0
    while (i < dictBytes) { dictId |= (byteAt(pos) & 0xffL) << (8 * i); pos += 1; i += 1 }
    if (dictId != 0) fail("dictionaries not implemented")
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2; case 2 => 4; case 3 => 8
    }
    var fcs = -1L
    if (fcsBytes > 0) {
      fcs = 0L
      var j = 0
      while (j < fcsBytes) { fcs |= (byteAt(pos) & 0xffL) << (8 * j); pos += 1; j += 1 }
      if (fcsBytes == 2) fcs += 256
    }
    if (singleSegment) windowSize = fcs
    val blockMax = math.min(if (windowSize > 0) windowSize else (1L << 17), 1L << 17).toInt

    val frame = new ByteBuf(1 << 14)
    val st = new FrameState
    var lastBlock = false
    while (!lastBlock) {
      if (pos + 3 > buf.length) fail("truncated block header")
      val bh = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16)
      pos += 3
      lastBlock = (bh & 1) == 1
      val blockType = (bh >> 1) & 3
      val blockSize = bh >> 3
      blockType match {
        case 0 => // Raw
          if (pos + blockSize > buf.length) fail("raw block overruns payload")
          frame.append(buf, pos, blockSize)
          pos += blockSize
        case 1 => // RLE
          if (pos >= buf.length) fail("truncated RLE block")
          if (blockSize > blockMax) fail("RLE block exceeds maximum size")
          frame.appendFill(buf(pos), blockSize)
          pos += 1
        case 2 => // Compressed
          if (blockSize > blockMax) fail("block exceeds maximum size")
          if (pos + blockSize > buf.length) fail("compressed block overruns payload")
          decodeCompressedBlock(buf, pos, blockSize, st, frame)
          pos += blockSize
        case _ => fail("reserved block type")
      }
    }
    val content = frame.toArray
    if (fcs >= 0 && content.length != fcs)
      fail(s"frame content size $fcs disagrees with decoded ${content.length}")
    if (hasChecksum) {
      if (pos + 4 > buf.length) fail("truncated content checksum")
      val want = ((buf(pos) & 0xffL)) | ((buf(pos + 1) & 0xffL) << 8) |
        ((buf(pos + 2) & 0xffL) << 16) | ((buf(pos + 3) & 0xffL) << 24)
      pos += 4
      val got = xxh64(content, 0, content.length) & 0xffffffffL
      if (got != want) fail("content checksum mismatch")
    }
    out.write(content, 0, content.length)
    pos
  }

  private def decodeCompressedBlock(buf: Array[Byte], off: Int, size: Int,
                                    st: FrameState,
                                    frame: ByteBuf): Unit = {
    val end = off + size
    // ---- literals section
    if (size < 1) fail("empty compressed block")
    val b0 = buf(off) & 0xff
    val litType = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    var p = off
    var literals: Array[Byte] = null
    litType match {
      case 0 | 1 => // Raw | RLE
        val regen = sizeFormat match {
          case 0 | 2 => p += 1; b0 >> 3
          case 1 =>
            if (p + 2 > end) fail("truncated literals header")
            val v = (b0 >> 4) | ((buf(p + 1) & 0xff) << 4); p += 2; v
          case 3 =>
            if (p + 3 > end) fail("truncated literals header")
            val v = (b0 >> 4) | ((buf(p + 1) & 0xff) << 4) |
              ((buf(p + 2) & 0xff) << 12)
            p += 3; v
        }
        if (litType == 0) {
          if (p + regen > end) fail("raw literals overrun block")
          literals = java.util.Arrays.copyOfRange(buf, p, p + regen)
          p += regen
        } else {
          if (p >= end) fail("truncated RLE literal")
          literals = Array.fill(regen)(buf(p)); p += 1
        }
      case 2 | 3 => // Compressed | Treeless
        var regen = 0; var comp = 0; var fourStreams = true
        sizeFormat match {
          case 0 | 1 =>
            if (p + 3 > end) fail("truncated literals header")
            regen = (b0 >> 4) | ((buf(p + 1) & 0x3f) << 4)
            comp = ((buf(p + 1) & 0xff) >> 6) | ((buf(p + 2) & 0xff) << 2)
            fourStreams = sizeFormat == 1
            p += 3
          case 2 =>
            if (p + 4 > end) fail("truncated literals header")
            regen = (b0 >> 4) | ((buf(p + 1) & 0xff) << 4) | ((buf(p + 2) & 3) << 12)
            comp = ((buf(p + 2) & 0xff) >> 2) | ((buf(p + 3) & 0xff) << 6)
            p += 4
          case 3 =>
            if (p + 5 > end) fail("truncated literals header")
            regen = (b0 >> 4) | ((buf(p + 1) & 0xff) << 4) | ((buf(p + 2) & 0x3f) << 12)
            comp = ((buf(p + 2) & 0xff) >> 6) | ((buf(p + 3) & 0xff) << 2) |
              ((buf(p + 4) & 0xff) << 10)
            p += 5
        }
        if (p + comp > end) fail("compressed literals overrun block")
        var q = p
        if (litType == 2) {
          val (ws, consumed) = readHufWeights(buf, q, comp)
          val (sym, nb, tlog) = hufDecodeTable(ws)
          st.hufSym = sym; st.hufBits = nb; st.hufLog = tlog
          q += consumed
        } else if (st.hufSym == null) fail("treeless literals with no previous table")
        val streamBytes = p + comp - q
        literals = new Array[Byte](regen)
        if (!fourStreams) {
          hufDecodeStream(buf, q, streamBytes, st.hufSym, st.hufBits, st.hufLog,
            literals, 0, regen)
        } else {
          if (streamBytes < 6) fail("four-stream literals too short for jump table")
          def u16(at: Int) = (buf(at) & 0xff) | ((buf(at + 1) & 0xff) << 8)
          val s1 = u16(q); val s2 = u16(q + 2); val s3 = u16(q + 4)
          val s4 = streamBytes - 6 - s1 - s2 - s3
          if (s4 <= 0) fail("four-stream jump table overruns section")
          val part = (regen + 3) / 4
          val last = regen - 3 * part
          if (last < 0) fail("four-stream regenerated size too small")
          val offs = Array(q + 6, q + 6 + s1, q + 6 + s1 + s2, q + 6 + s1 + s2 + s3)
          val lens = Array(s1, s2, s3, s4)
          val outs = Array(part, part, part, last)
          var k = 0
          while (k < 4) {
            hufDecodeStream(buf, offs(k), lens(k), st.hufSym, st.hufBits,
              st.hufLog, literals, k * part, outs(k))
            k += 1
          }
        }
        p += comp
    }

    // ---- sequences section
    if (p >= end) fail("missing sequences section")
    val s0 = buf(p) & 0xff; p += 1
    val nbSeq =
      if (s0 == 0) 0
      else if (s0 < 128) s0
      else if (s0 < 255) {
        if (p >= end) fail("truncated sequence count")
        val v = ((s0 - 128) << 8) + (buf(p) & 0xff); p += 1; v
      } else {
        if (p + 2 > end) fail("truncated sequence count")
        val v = (buf(p) & 0xff) + ((buf(p + 1) & 0xff) << 8) + 0x7f00
        p += 2; v
      }
    if (nbSeq == 0) {
      if (p != end) fail("bytes trailing a literals-only block")
      frame.append(literals, 0, literals.length)
      return
    }
    if (p >= end) fail("truncated compression modes")
    val modes = buf(p) & 0xff; p += 1
    if ((modes & 3) != 0) fail("reserved compression-mode bits set")

    def loadTable(mode: Int, defaultNorm: Array[Int], defaultLog: Int,
                  maxSym: Int, maxLog: Int,
                  prev: Array[FseCell]): Array[FseCell] = mode match {
      case 0 => fseDecodeTable(defaultNorm, defaultLog)
      case 1 =>
        if (p >= end) fail("truncated RLE symbol")
        val sym = buf(p) & 0xff; p += 1
        if (sym > maxSym) fail(s"RLE symbol $sym exceeds max $maxSym")
        Array(FseCell(sym, 0, 0))
      case 2 =>
        val (norm, tlog, consumed) = readNCount(buf, p, end - p, maxSym, maxLog)
        p += consumed
        fseDecodeTable(norm, tlog)
      case _ =>
        if (prev == null) fail("repeat mode with no previous table")
        prev
    }
    // table order in the block: LL, OF, ML
    st.llTable = loadTable((modes >> 6) & 3, LLDefaultNorm, LLDefaultLog, 35, 9, st.llTable)
    st.ofTable = loadTable((modes >> 4) & 3, OFDefaultNorm, OFDefaultLog, 31, 8, st.ofTable)
    st.mlTable = loadTable((modes >> 2) & 3, MLDefaultNorm, MLDefaultLog, 52, 9, st.mlTable)

    val llLog = 31 - Integer.numberOfLeadingZeros(st.llTable.length)
    val ofLog = 31 - Integer.numberOfLeadingZeros(st.ofTable.length)
    val mlLog = 31 - Integer.numberOfLeadingZeros(st.mlTable.length)

    val bits = new RBits(buf, p, end - p)
    var llState = bits.read(llLog)
    var ofState = bits.read(ofLog)
    var mlState = bits.read(mlLog)

    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val llCell = st.llTable(llState)
      val ofCell = st.ofTable(ofState)
      val mlCell = st.mlTable(mlState)
      val ofCode = ofCell.symbol
      if (ofCode > 31) fail("offset code out of range")
      val offValue = (1L << ofCode) + bits.readLong(ofCode)
      val mlCode = mlCell.symbol
      if (mlCode > 52) fail("match-length code out of range")
      val ml = MLBaseline(mlCode) + bits.read(MLBits(mlCode))
      val llCode = llCell.symbol
      if (llCode > 35) fail("literal-length code out of range")
      val ll = LLBaseline(llCode) + bits.read(LLBits(llCode))

      // repeat-offset machinery (§3.1.1.5)
      var offset = 0L
      if (offValue > 3) {
        offset = offValue - 3
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
      } else {
        val idx = if (ll == 0) offValue + 1 else offValue
        idx match {
          case 1 => offset = st.rep1
          case 2 =>
            offset = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
          case 3 =>
            offset = st.rep3; st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
          case _ =>
            offset = st.rep1 - 1
            if (offset <= 0) fail("repeat offset underflow")
            st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
        }
      }

      if (litPos + ll > literals.length) fail("sequence literals overrun")
      frame.append(literals, litPos, ll)
      litPos += ll
      // match copy straight from the frame built so far (overlap allowed)
      if (offset > frame.len) fail("match offset reaches before frame start")
      frame.selfCopy(offset.toInt, ml)

      if (seq < nbSeq - 1) {
        // state updates, order LL -> ML -> OF
        llState = llCell.baseline + bits.read(llCell.nbBits)
        mlState = mlCell.baseline + bits.read(mlCell.nbBits)
        ofState = ofCell.baseline + bits.read(ofCell.nbBits)
      }
      seq += 1
    }
    if (bits.bitPos != 0) fail("sequence bitstream not fully consumed")
    if (litPos < literals.length)
      frame.append(literals, litPos, literals.length - litPos)
  }

  // =================================================== encoder (fixtures)

  /** FSE encode table (libzstd's FSE_buildCTable shape, built from the
    * same [[fseSpread]] as the decoder so the two sides cannot drift). */
  private final class FseEncTable(norm: Array[Int], val tableLog: Int) {
    val tableSize: Int = 1 << tableLog
    val stateTable = new Array[Int](tableSize)
    val deltaNbBits = new Array[Int](norm.length)
    val deltaFindState = new Array[Int](norm.length)
    locally {
      val spread = fseSpread(norm, tableLog)
      val cursor = new Array[Int](norm.length)
      var acc = 0
      var s = 0
      while (s < norm.length) {
        cursor(s) = acc
        acc += (if (norm(s) == -1) 1 else norm(s))
        s += 1
      }
      var u = 0
      while (u < tableSize) {
        val sym = spread(u)
        stateTable(cursor(sym)) = tableSize + u
        cursor(sym) += 1
        u += 1
      }
      var total = 0
      s = 0
      while (s < norm.length) {
        norm(s) match {
          case 0 =>
            deltaNbBits(s) = ((tableLog + 1) << 16) - tableSize
          case -1 | 1 =>
            deltaNbBits(s) = (tableLog << 16) - tableSize
            deltaFindState(s) = total - 1
            total += 1
          case c =>
            val maxBitsOut = tableLog - (31 - Integer.numberOfLeadingZeros(c - 1))
            deltaNbBits(s) = (maxBitsOut << 16) - (c << maxBitsOut)
            deltaFindState(s) = total - c
            total += c
        }
        s += 1
      }
    }
  }

  private final class FseEncState(t: FseEncTable) {
    private var value = 0
    def init(sym: Int): Unit = {
      val nbBitsOut = (t.deltaNbBits(sym) + (1 << 15)) >> 16
      value = t.stateTable(
        (((nbBitsOut << 16) - t.deltaNbBits(sym)) >> nbBitsOut) +
          t.deltaFindState(sym))
    }
    def encode(w: WBits, sym: Int): Unit = {
      val nbBitsOut = (value + t.deltaNbBits(sym)) >> 16
      w.add((value & ((1 << nbBitsOut) - 1)).toLong, nbBitsOut)
      value = t.stateTable((value >> nbBitsOut) + t.deltaFindState(sym))
    }
    def flush(w: WBits): Unit =
      w.add((value & (t.tableSize - 1)).toLong, t.tableLog)
  }

  private lazy val LLEncTable = new FseEncTable(LLDefaultNorm, LLDefaultLog)
  private lazy val OFEncTable = new FseEncTable(OFDefaultNorm, OFDefaultLog)
  private lazy val MLEncTable = new FseEncTable(MLDefaultNorm, MLDefaultLog)

  private def llCodeOf(ll: Int): Int =
    if (ll <= 15) ll
    else {
      var c = 16
      while (c + 1 < LLBaseline.length && LLBaseline(c + 1) <= ll) c += 1
      c
    }
  private def mlCodeOf(ml: Int): Int =
    if (ml <= 34) ml - 3
    else {
      var c = 32
      while (c + 1 < MLBaseline.length && MLBaseline(c + 1) <= ml) c += 1
      c
    }

  private final case class Sequence(ll: Int, ml: Int, offset: Int)

  /** Greedy hash-chain LZ77 over one block (offsets stay block-local —
    * the decoder supports cross-block reach, the encoder doesn't need
    * it). Min match 4 (format minimum is 3; 4 keeps the hash simple). */
  private def findSequences(data: Array[Byte], off: Int, len: Int)
      : (Array[Sequence], Array[Byte]) = {
    val end = off + len
    val table = new Array[Int](1 << 15)
    java.util.Arrays.fill(table, -1)
    def h4(p: Int): Int = {
      val v = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
        ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24)
      (v * 0x9E3779B1) >>> 17
    }
    val seqs = Array.newBuilder[Sequence]
    val lits = new java.io.ByteArrayOutputStream()
    var i = off
    var anchor = off
    while (i + 4 <= end) {
      val h = h4(i)
      val cand = table(h)
      table(h) = i
      if (cand >= off &&
          data(cand) == data(i) && data(cand + 1) == data(i + 1) &&
          data(cand + 2) == data(i + 2) && data(cand + 3) == data(i + 3)) {
        var ml = 4
        while (i + ml < end && data(cand + ml) == data(i + ml)) ml += 1
        lits.write(data, anchor, i - anchor)
        seqs += Sequence(i - anchor, ml, i - cand)
        anchor = i + ml
        i = anchor
      } else i += 1
    }
    lits.write(data, anchor, end - anchor)
    (seqs.result(), lits.toByteArray)
  }

  /** Raw (type 0) or RLE (type 1) literals-section bytes. */
  private def rawRleLitSection(tpe: Int, regen: Int, content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (regen <= 31) out.write(tpe | (regen << 3)) // size_format 00
    else if (regen <= 4095) { // size_format 01
      out.write(tpe | (1 << 2) | ((regen & 0xf) << 4))
      out.write(regen >> 4)
    } else { // size_format 11 (20-bit)
      out.write(tpe | (3 << 2) | ((regen & 0xf) << 4))
      out.write((regen >> 4) & 0xff)
      out.write(regen >> 12)
    }
    out.write(content, 0, content.length)
    out.toByteArray
  }

  /** Huffman-compressed literals section (1 stream, direct weights,
    * 3-byte sf=00 header). None when the literals don't fit the format
    * (symbols ≥ 128 present, > 1023 bytes, degenerate histogram, depth
    * > 11, or compression doesn't pay) — callers fall back to Raw. */
  private def hufLitSection(lits: Array[Byte]): Option[Array[Byte]] = {
    val n = lits.length
    if (n < 2 || n > 1023) return None
    val freq = new Array[Long](256)
    lits.foreach(b => freq(b & 0xff) += 1)
    val maxSym = freq.lastIndexWhere(_ > 0)
    if (maxSym >= 128) return None // direct weights carry at most 128 symbols
    val present = freq.count(_ > 0)
    if (present < 2) return None // single-symbol: RLE literals win anyway
    // Huffman code lengths via pairwise merge
    final case class Node(f: Long, syms: List[Int])
    val depth = new Array[Int](maxSym + 1)
    var heap = scala.collection.mutable.PriorityQueue.empty[Node](
      Ordering.by[Node, Long](_.f).reverse)
    (0 to maxSym).foreach(s => if (freq(s) > 0) heap += Node(freq(s), List(s)))
    while (heap.size > 1) {
      val a = heap.dequeue(); val b = heap.dequeue()
      (a.syms ++ b.syms).foreach(s => depth(s) += 1)
      heap += Node(a.f + b.f, a.syms ++ b.syms)
    }
    val maxBits = depth.max
    if (maxBits > 11) return None // skip the rare deep tree, use Raw
    // weights; the LAST present symbol's weight is implied
    val weights = (0 to maxSym).map(s =>
      if (freq(s) == 0) 0 else maxBits + 1 - depth(s)).toArray
    // canonical code assignment must mirror hufDecodeTable's rank layout
    val tableLog = maxBits
    val maxW = weights.max
    val rankVal = new Array[Int](maxW + 2)
    var pos = 0
    var w = 1
    while (w <= maxW) {
      rankVal(w) = pos
      var s = 0
      while (s <= maxSym) { if (weights(s) == w) pos += 1 << (w - 1); s += 1 }
      w += 1
    }
    val codes = new Array[Int](maxSym + 1)
    val nbits = new Array[Int](maxSym + 1)
    var s = 0
    while (s <= maxSym) {
      val ws = weights(s)
      if (ws > 0) {
        nbits(s) = tableLog + 1 - ws
        codes(s) = rankVal(ws) >> (tableLog - nbits(s))
        rankVal(ws) += 1 << (ws - 1)
      }
      s += 1
    }
    // weights description: direct 4-bit, excluding the last present symbol
    val wlist = weights.take(maxSym) // symbol ids 0 .. maxSym-1
    val desc = new java.io.ByteArrayOutputStream()
    desc.write(127 + wlist.length)
    var i = 0
    while (i < wlist.length) {
      val hi = wlist(i)
      val lo = if (i + 1 < wlist.length) wlist(i + 1) else 0
      desc.write((hi << 4) | lo)
      i += 2
    }
    // stream: symbols encoded in REVERSE so the backward reader emits
    // them forward
    val wb = new WBits
    var k = n - 1
    while (k >= 0) {
      val sym = lits(k) & 0xff
      wb.add(codes(sym).toLong, nbits(sym))
      k -= 1
    }
    val stream = wb.close()
    val comp = desc.size() + stream.length
    if (comp > 1023 || comp >= n) return None // must pay for itself
    // 3-byte sf=00 header: byte0[7:4]=regen[3:0], byte1[5:0]=regen[9:4],
    // byte1[7:6]=comp[1:0], byte2=comp[9:2]
    val out = new java.io.ByteArrayOutputStream()
    out.write(2 | ((n & 0xf) << 4)) // type=2 Compressed, sf=00
    out.write(((n >> 4) & 0x3f) | ((comp & 0x3) << 6))
    out.write((comp >> 2) & 0xff)
    val db = desc.toByteArray
    out.write(db, 0, db.length)
    out.write(stream, 0, stream.length)
    Some(out.toByteArray)
  }

  /** Sequences section under the PREDEFINED FSE tables: count, modes byte
    * (all Predefined), then the backward-read interleaved bitstream —
    * states initialized with the LAST sequence, loop from nbSeq-2 down to
    * 0, flush order ML/OF/LL (the reader meets LL/OF/ML first). */
  private def seqSection(seqs: Array[Sequence]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val n = seqs.length
    if (n == 0) { out.write(0); return out.toByteArray }
    if (n < 128) out.write(n)
    else if (n < 0x7f00) { out.write((n >> 8) + 128); out.write(n & 0xff) }
    else { out.write(255); out.write((n - 0x7f00) & 0xff); out.write((n - 0x7f00) >> 8) }
    out.write(0) // modes: LL/OF/ML all Predefined, reserved 0
    val llc = seqs.map(s => llCodeOf(s.ll))
    val mlc = seqs.map(s => mlCodeOf(s.ml))
    val ofv = seqs.map(s => s.offset.toLong + 3) // never a repeat code
    val ofc = ofv.map(v => 63 - java.lang.Long.numberOfLeadingZeros(v))
    val wb = new WBits
    val llS = new FseEncState(LLEncTable)
    val ofS = new FseEncState(OFEncTable)
    val mlS = new FseEncState(MLEncTable)
    val last = n - 1
    mlS.init(mlc(last)); ofS.init(ofc(last).toInt); llS.init(llc(last))
    def extras(i: Int): Unit = {
      wb.add((seqs(i).ll - LLBaseline(llc(i))).toLong, LLBits(llc(i)))
      wb.add((seqs(i).ml - MLBaseline(mlc(i))).toLong, MLBits(mlc(i)))
      wb.add(ofv(i) - (1L << ofc(i)), ofc(i).toInt)
    }
    extras(last)
    var i = n - 2
    while (i >= 0) {
      ofS.encode(wb, ofc(i).toInt)
      mlS.encode(wb, mlc(i))
      llS.encode(wb, llc(i))
      extras(i)
      i -= 1
    }
    mlS.flush(wb); ofS.flush(wb); llS.flush(wb)
    val bits = wb.close()
    out.write(bits, 0, bits.length)
    out.toByteArray
  }

  /** One block's worth of content → (blockType, blockBody). Compressed
    * when it pays, RLE for constant runs, Raw otherwise. */
  private def encodeBlock(data: Array[Byte], off: Int, len: Int): (Int, Array[Byte]) = {
    if (len > 0) {
      var allSame = true
      var i = off + 1
      while (allSame && i < off + len) { allSame = data(i) == data(off); i += 1 }
      if (allSame) return (1, Array(data(off)))
    }
    val (seqs, lits) = findSequences(data, off, len)
    val litSec = hufLitSection(lits).getOrElse {
      if (lits.length == 0 || lits.distinct.length > 1)
        rawRleLitSection(0, lits.length, lits)
      else rawRleLitSection(1, lits.length, Array(lits(0)))
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write(litSec, 0, litSec.length)
    val ss = seqSection(seqs)
    body.write(ss, 0, ss.length)
    val comp = body.toByteArray
    if (comp.length >= len) (0, java.util.Arrays.copyOfRange(data, off, off + len))
    else (2, comp)
  }

  /** Block chunk size for multi-block coverage on ordinary documents. */
  val BlockChunk = 1800

  /** One complete zstd frame (single-segment, content checksum). */
  def zstd(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    w32(0xFD2FB528L)
    val n = data.length
    val fcsFlag = if (n <= 255) 0 else if (n - 256 < 65536) 1 else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04) // single-segment + checksum
    fcsFlag match {
      case 0 => out.write(n)
      case 1 => out.write((n - 256) & 0xff); out.write((n - 256) >> 8)
      case _ => w32(n.toLong)
    }
    if (n == 0) {
      out.write(1); out.write(0); out.write(0) // last, Raw, size 0
    } else {
      var off = 0
      while (off < n) {
        val len = math.min(BlockChunk, n - off)
        val lastBit = if (off + len >= n) 1 else 0
        val (tpe, body) = encodeBlock(data, off, len)
        val sizeField = if (tpe == 1) len else body.length
        val bh = lastBit | (tpe << 1) | (sizeField << 3)
        out.write(bh & 0xff); out.write((bh >> 8) & 0xff); out.write((bh >> 16) & 0xff)
        out.write(body, 0, body.length)
        off += len
      }
    }
    w32(xxh64(data, 0, data.length) & 0xffffffffL)
    out.toByteArray
  }

  /** Concatenated frames (the multi-frame dump shape). */
  def zstdMembers(parts: Seq[Array[Byte]]): Array[Byte] =
    parts.map(zstd).foldLeft(Array.emptyByteArray)(_ ++ _)

  /** A skippable frame (magic 0x184D2A50) carrying `payload`. */
  def skippableFrame(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    w32(0x184D2A50L)
    w32(payload.length.toLong)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}
