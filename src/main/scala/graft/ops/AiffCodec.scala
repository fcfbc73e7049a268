package graft.ops

/** AIFF codec (Apple's IFF-based audio container — the BIG-ENDIAN twin of
  * WAV, still common in scraped music/podcast corpora): `FORM`/`AIFF`
  * grouping chunk, `COMM` (channels, frame count, sample width, and the
  * format's one genuinely exotic field — the sample rate as an 80-bit
  * IEEE 754 extended-precision float), `SSND` with offset/blockSize
  * preamble, big-endian signed PCM. Unknown chunks (the fixture plants an
  * `ANNO` annotation) are walked over by size, with odd-size chunks
  * padded to even — the IFF rule readers forget.
  *
  * Loud-failure contract (the codec-family stance): bad magic, truncated
  * chunks, a COMM/SSND mismatch, non-16-bit samples, >2 channels, or a
  * sample rate whose extended-float mantissa is not an exact integer all
  * throw — never a silent mis-decode. */
object AiffCodec {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** 80-bit extended-precision encoding of a positive integer rate:
    * 15-bit exponent biased 16383, EXPLICIT leading-1 64-bit mantissa. */
  def extended(rate: Int): Array[Byte] = {
    require(rate > 0, "aiff: rate must be positive")
    val log = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exp = 16383 + log
    val mant = rate.toLong << (63 - log)
    be16(exp) ++ be32(mant >>> 32) ++ be32(mant & 0xffffffffL)
  }

  /** Inverse of [[extended]] for integer-valued rates; fractional
    * mantissas throw (out of the implemented subset, loudly). */
  def parseExtended(b: Array[Byte], at: Int): Int = {
    val se = ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
    require((se & 0x8000) == 0, "aiff: negative sample rate")
    val exp = se - 16383
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(at + 2 + i) & 0xff); i += 1 }
    require(exp >= 0 && exp < 31, s"aiff: sample-rate exponent $exp out of range")
    val shift = 63 - exp
    require(shift >= 0 && (shift >= 64 || (mant & ((1L << shift) - 1)) == 0),
      "aiff: non-integer sample rate not implemented")
    (mant >>> shift).toInt
  }

  /** Encode 16-bit PCM (interleaved when stereo). `annoChunk` plants an
    * ANNO chunk with an ODD payload size before COMM — the IFF
    * even-padding trap. */
  def encode(rate: Int, channels: Int, samples: Array[Short],
             annoChunk: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 2, "aiff: mono/stereo only")
    require(samples.length % channels == 0, "aiff: ragged interleave")
    val body = new java.io.ByteArrayOutputStream()
    if (annoChunk) {
      val note = "graft fixture".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      body.write("ANNO".getBytes, 0, 4)
      body.write(be32(note.length.toLong), 0, 4)
      body.write(note, 0, note.length)
      if (note.length % 2 == 1) body.write(0) // IFF even padding
    }
    body.write("COMM".getBytes, 0, 4)
    body.write(be32(18L), 0, 4)
    body.write(be16(channels), 0, 2)
    body.write(be32(samples.length.toLong / channels), 0, 4)
    body.write(be16(16), 0, 2)
    val ext = extended(rate)
    body.write(ext, 0, 10)
    body.write("SSND".getBytes, 0, 4)
    body.write(be32(8L + 2L * samples.length), 0, 4)
    body.write(be32(0L), 0, 4) // offset
    body.write(be32(0L), 0, 4) // blockSize
    samples.foreach { s => body.write((s >> 8) & 0xff); body.write(s & 0xff) }
    if (samples.length % 2 == 1) { /* 2-byte samples: always even */ }
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("FORM".getBytes, 0, 4)
    out.write(be32(4L + b.length), 0, 4)
    out.write("AIFF".getBytes, 0, 4)
    out.write(b, 0, b.length)
    out.toByteArray
  }

  /** Decode an AIFF payload. Returns (rate, channels, interleaved). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    require(payload.length >= 12, "aiff: truncated stream")
    def tag(at: Int) = new String(payload, at, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    def u32(at: Int): Long =
      ((payload(at) & 0xffL) << 24) | ((payload(at + 1) & 0xffL) << 16) |
        ((payload(at + 2) & 0xffL) << 8) | (payload(at + 3) & 0xffL)
    def u16(at: Int): Int = ((payload(at) & 0xff) << 8) | (payload(at + 1) & 0xff)
    require(tag(0) == "FORM", "not an AIFF payload")
    val formLen = u32(4)
    require(12 + formLen - 4 <= payload.length, "aiff: FORM size overruns stream")
    // family-wide every-byte-accounted rule (tar/WARC/PNM/gzip): bytes
    // trailing the FORM chunk are corruption, not padding
    require(8 + formLen == payload.length, "aiff: trailing bytes after FORM chunk")
    require(tag(8) == "AIFF", s"aiff: bad form type '${tag(8)}'")
    var pos = 12
    val end = (8 + formLen).toInt
    var rate = -1
    var channels = -1
    var frames = -1L
    var data: Array[Short] = null
    while (pos < end) {
      require(pos + 8 <= end, s"aiff: truncated chunk header at $pos")
      val id = tag(pos)
      val len = u32(pos + 4)
      val at = pos + 8
      require(at + len <= end, s"aiff: chunk '$id' overruns the stream")
      id match {
        case "COMM" =>
          require(len == 18, s"aiff: bad COMM length $len")
          channels = u16(at)
          require(channels == 1 || channels == 2,
            s"aiff: only mono/stereo implemented (got $channels)")
          frames = u32(at + 2)
          val bits = u16(at + 6)
          require(bits == 16, s"aiff: only 16-bit implemented (got $bits)")
          rate = parseExtended(payload, at + 8)
        case "SSND" =>
          require(channels > 0, "aiff: SSND before COMM")
          val offset = u32(at)
          val n = frames * channels
          // EQUALITY, not >=: an SSND larger than COMM's frame count would
          // silently truncate the extra samples — the mismatch must throw
          require(len == 8 + offset + 2 * n,
            s"aiff: SSND size $len disagrees with COMM frames ($n samples)")
          val base = (at + 8 + offset).toInt
          data = Array.tabulate(n.toInt)(i =>
            (((payload(base + 2 * i) & 0xff) << 8) |
              (payload(base + 2 * i + 1) & 0xff)).toShort)
        case _ => // unknown chunk: walk over by size
      }
      pos = at + len.toInt + (len.toInt & 1) // IFF even padding
    }
    require(rate > 0, "aiff: missing COMM chunk")
    require(data != null, "aiff: missing SSND chunk")
    (rate, channels, data)
  }

  /** Decode + the shared one-pass signal stats — the WAV/FLAC consumer
    * contract, so an AIFF of the same signal yields identical stats. */
  def decodeFeatures(a: MediaAsset): AudioFeatures = {
    val (rate, channels, ss) = decode(a.payload)
    WavCodec.featuresOf(a.asset_id, a.format, rate, channels, ss)
  }
}
