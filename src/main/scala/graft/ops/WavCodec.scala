package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Asset-level features of a decoded audio payload: sample geometry plus
  * the classic signal stats a curation pipeline filters on (silence
  * detection via RMS/peak, tonality proxy via zero-crossing rate). */
final case class AudioFeatures(
    asset_id: Long, format: String, sample_rate: Int, channels: Int,
    n_samples: Long, duration_s: Double, rms: Double, peak: Int,
    zero_crossings: Long)

/** One fixed-size analysis frame of a decoded audio stream (the shape a
  * VAD / loudness-normalization / segment-selection stage consumes). */
final case class AudioFrame(
    asset_id: Long, frame_idx: Int, n: Int, rms: Double, peak: Int)

/** REAL WAV codec — pure-JVM byte-level encode/decode of the RIFF/WAVE
  * 16-bit PCM layout (RIFF header, chunk walk with even-size padding,
  * `fmt ` prerequisites, little-endian interleaved samples — the public
  * file-format layout). Like [[BmpCodec]], this replaces the honest stub
  * for a format the sandbox can genuinely decode without native codec
  * libraries; FakeDecoder remains only for formats that would need
  * ffmpeg-class decoders.
  *
  * The decoder is a chunk WALK, not a fixed-offset parse: unknown chunks
  * (`LIST`, `JUNK`, cue metadata…) between `fmt ` and `data` are skipped
  * with the RIFF even-byte padding rule, because real-world WAV files
  * carry them and a fixed 44-byte assumption silently mis-reads samples.
  */
object WavCodec {

  /** Encode interleaved 16-bit PCM samples as a RIFF/WAVE file. When
    * `junkChunk` is set, a `JUNK` metadata chunk (odd-sized, to exercise
    * the padding rule) is placed between `fmt ` and `data` — decoders that
    * assume a fixed 44-byte header break on exactly such files. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
             junkChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, "need positive rate/channels")
    require(samples.length % channels == 0, "samples must interleave evenly")
    val dataSize = samples.length * 2
    val junkBody = 5 // odd on purpose: forces the pad byte
    val junkSize = if (junkChunk) 8 + junkBody + 1 else 0
    val riffSize = 4 + (8 + 16) + junkSize + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16.toShort)
    if (junkChunk) {
      buf.put("JUNK".getBytes("US-ASCII")).putInt(junkBody)
      var i = 0
      while (i < junkBody) { buf.put(0x6a.toByte); i += 1 }
      buf.put(0.toByte) // RIFF pad to even
    }
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  // ------------------------------------------------ G.711 µ-law (format 7)

  /** ITU-T G.711 µ-law EXPANSION: one on-wire code byte → 16-bit linear
    * sample (the public CCITT reference arithmetic: complement, 4-bit
    * mantissa biased by 0x84, 3-bit exponent shift, signed de-bias). */
  def mulawToLinear(code: Int): Short = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** ITU-T G.711 µ-law COMPRESSION: 16-bit linear sample → code byte
    * (clip at 32635, add the 0x84 bias, segment = position of the leading
    * bit, 4-bit mantissa, complement). Round-trip contracts are pinned by
    * spec: `linearToMulaw(mulawToLinear(c)) == c` for every code except
    * 0x7F (negative zero aliases to positive zero), and expansion error is
    * bounded by the segment's step size. */
  def linearToMulaw(sample: Short): Int = {
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    ~(sign | (exp << 4) | ((s >> (exp + 3)) & 0x0f)) & 0xff
  }

  /** Encode µ-law code bytes as a RIFF/WAVE file with format tag 7
    * (WAVE_FORMAT_MULAW): 8 bits/sample, and the 18-byte fmt chunk
    * (cbSize = 0) the WAVE spec requires for non-PCM formats — decoders
    * that hard-assume the 16-byte PCM fmt body mis-walk exactly here. */
  def encodeMulaw(sampleRate: Int, channels: Int, codes: Array[Byte],
                  junkChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, "need positive rate/channels")
    require(codes.length % channels == 0, "codes must interleave evenly")
    val dataSize = codes.length
    val junkBody = 5
    val junkSize = if (junkChunk) 8 + junkBody + 1 else 0
    val riffSize = 4 + (8 + 18) + junkSize + (8 + dataSize) + (dataSize & 1)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7.toShort) // WAVE_FORMAT_MULAW
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels) // byte rate: one byte per sample
      .putShort(channels.toShort)    // block align
      .putShort(8.toShort)           // bits per sample
      .putShort(0.toShort)           // cbSize
    if (junkChunk) {
      buf.put("JUNK".getBytes("US-ASCII")).putInt(junkBody)
      var i = 0
      while (i < junkBody) { buf.put(0x6a.toByte); i += 1 }
      buf.put(0.toByte)
    }
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize).put(codes)
    if ((dataSize & 1) == 1) buf.put(0.toByte) // RIFF pad to even
    buf.array()
  }

  // ------------------------------------------- IMA ADPCM (format 0x11)

  /** IMA/DVI ADPCM step-size table (the public 89-entry table from the
    * IMA Digital Audio Pack recommendation). */
  private[graft] val AdpcmSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index-adaptation table (per 3-bit code magnitude). */
  private[graft] val AdpcmIndexAdjust: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM prediction step shared by encoder and decoder: given a
    * 4-bit code and (pred, index), the next (pred, index) — the decoder's
    * reconstruction IS the encoder's predictor, which is what makes the
    * codec self-synchronizing. */
  private def adpcmStep(code: Int, pred: Int, index: Int): (Int, Int) = {
    val step = AdpcmSteps(index)
    var dq = step >> 3
    if ((code & 4) != 0) dq += step
    if ((code & 2) != 0) dq += step >> 1
    if ((code & 1) != 0) dq += step >> 2
    val p = math.max(-32768, math.min(32767,
      if ((code & 8) != 0) pred - dq else pred + dq))
    val i = math.max(0, math.min(88, index + AdpcmIndexAdjust(code & 7)))
    (p, i)
  }

  /** Encode mono 16-bit samples as WAVE_FORMAT_IMA_ADPCM (0x11): the
    * block layout of the public IMA-in-WAV mapping — per block a 4-byte
    * header (int16 predictor = the block's first sample verbatim, uint8
    * step index, reserved) then two 4-bit codes per byte, LOW nibble
    * first; `fact` chunk carries the true sample count so decoders trim
    * the final block's padding; fmt chunk is the 20-byte compressed form
    * (cbSize = 2, wSamplesPerBlock). The step index carries ACROSS blocks
    * (each header snapshots it), so blocks decode independently — the
    * format's own parallelism unit. */
  def encodeAdpcm(sampleRate: Int, samples: Array[Short],
                  blockAlign: Int = 256): Array[Byte] = {
    require(sampleRate > 0, "need a positive rate")
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      "blockAlign must be >= 8 and a multiple of 4")
    require(samples.nonEmpty, "need at least one sample")
    val spb = (blockAlign - 4) * 2 + 1 // samples per block incl. header
    val nBlocks = (samples.length + spb - 1) / spb
    val dataSize = nBlocks * blockAlign
    val riffSize = 4 + (8 + 20) + (8 + 4) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11.toShort) // WAVE_FORMAT_IMA_ADPCM
      .putShort(1.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / spb) // approx byte rate
      .putShort(blockAlign.toShort)
      .putShort(4.toShort)   // bits per (coded) sample
      .putShort(2.toShort)   // cbSize
      .putShort(spb.toShort) // wSamplesPerBlock
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var pos = 0
    var index = 0
    while (pos < samples.length) {
      var pred: Int = samples(pos)
      buf.putShort(pred.toShort).put(index.toByte).put(0.toByte)
      var i = 1
      var nibbles = 0
      var pair = 0
      while (i < spb) {
        val code =
          if (pos + i < samples.length) {
            val s = samples(pos + i).toInt
            val step = AdpcmSteps(index)
            val diff = s - pred
            val sign = if (diff < 0) 8 else 0
            var d = math.abs(diff)
            var c = sign
            if (d >= step) { c |= 4; d -= step }
            if (d >= (step >> 1)) { c |= 2; d -= step >> 1 }
            if (d >= (step >> 2)) c |= 1
            val (p2, i2) = adpcmStep(c, pred, index)
            pred = p2; index = i2
            c
          } else 0 // final-block padding; `fact` trims it on decode
        if (nibbles % 2 == 0) pair = code & 0xf
        else { buf.put((pair | ((code & 0xf) << 4)).toByte) }
        nibbles += 1
        i += 1
      }
      pos += spb
    }
    buf.array()
  }

  /** Parse a RIFF/WAVE payload into (sampleRate, channels, interleaved
    * 16-bit samples). Walks the chunk list (even-size padding honored),
    * validates magics, format code and bit depth — a malformed payload
    * fails loudly instead of producing garbage stats. Format 1 (16-bit
    * PCM) passes samples through; format 7 (G.711 µ-law) EXPANDS each
    * code byte to its linear value; format 0x11 (IMA ADPCM) runs the
    * block-structured predictive reconstruction (`fact`-trimmed), so
    * every downstream stat runs over the real decoded signal regardless
    * of the on-wire encoding. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    require(payload.length >= 12, "truncated RIFF header")
    def fourcc(off: Int) = new String(payload, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a WAVE payload")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var channels = -1
    var tag = -1
    var blockAlign = -1
    var factLen = -1
    var samples: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val id = fourcc(pos)
      val size = buf.getInt(pos + 4)
      // Long bound: hostile sizes near Int.MaxValue must not wrap negative
      require(size >= 0 && pos.toLong + 8 + size <= payload.length,
        s"chunk '$id' overruns payload")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          tag = buf.getShort(body).toInt
          require(tag == 1 || tag == 7 || tag == 0x11,
            s"only PCM (1), mu-law (7) and IMA ADPCM (0x11) supported, got format $tag")
          channels = buf.getShort(body + 2).toInt
          rate = buf.getInt(body + 4)
          blockAlign = buf.getShort(body + 12).toInt
          val bits = buf.getShort(body + 14).toInt
          val want = tag match { case 1 => 16; case 7 => 8; case _ => 4 }
          require(bits == want,
            s"format $tag requires $want-bit samples, got $bits")
          require(channels > 0 && rate > 0, "invalid fmt geometry")
          if (tag == 0x11) {
            require(channels == 1, "IMA ADPCM: mono only")
            require(blockAlign >= 8, "IMA ADPCM: blockAlign too small")
          }
        case "fact" =>
          require(size >= 4, "fact chunk too small")
          factLen = buf.getInt(body)
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          tag match {
            case 7 =>
              samples = new Array[Short](size)
              var i = 0
              while (i < size) { samples(i) = mulawToLinear(payload(body + i) & 0xff); i += 1 }
            case 0x11 =>
              require(factLen >= 0, "IMA ADPCM requires a fact chunk before data")
              require(size % blockAlign == 0, "data size not a whole block count")
              val spb = (blockAlign - 4) * 2 + 1
              val out = new Array[Short](factLen)
              var o = 0
              var b = body
              while (b < body + size && o < factLen) {
                var pred: Int = buf.getShort(b)
                var index: Int = payload(b + 2) & 0xff
                require(index <= 88, s"corrupt block header index $index")
                out(o) = pred.toShort; o += 1
                var i = 1
                while (i < spb && o < factLen) {
                  val byte = payload(b + 4 + (i - 1) / 2) & 0xff
                  val code = if ((i - 1) % 2 == 0) byte & 0xf else byte >> 4
                  val (p2, i2) = adpcmStep(code, pred, index)
                  pred = p2; index = i2
                  out(o) = pred.toShort; o += 1
                  i += 1
                }
                b += blockAlign
              }
              require(o == factLen, s"fact says $factLen samples, stream held $o")
              samples = out
            case _ =>
              require(size % 2 == 0, "odd data size for 16-bit samples")
              samples = new Array[Short](size / 2)
              var i = 0
              while (i < samples.length) { samples(i) = buf.getShort(body + i * 2); i += 1 }
          }
        case _ => () // unknown metadata chunk: skip
      }
      pos = body + size + (size & 1) // RIFF pads chunks to even offsets
    }
    require(samples != null, "no data chunk")
    (rate, channels, samples)
  }

  /** Decode + signal stats in one pass over the REAL samples: RMS
    * (double, exact integer accumulation — sum of squares stays well
    * below 2^53 for any corpus this fixture produces), peak |amplitude|,
    * and sign-change count over the interleaved stream. `duration_s` is
    * per-channel frames over the rate. */
  def decodeFeatures(a: MediaAsset): AudioFeatures = {
    val (rate, channels, ss) = decode(a.payload)
    featuresOf(a.asset_id, a.format, rate, channels, ss)
  }

  /** The stats pass alone, shared with the other lossless audio decoders
    * ([[FlacCodec.decodeFeatures]]) — one definition of rms/peak/zc. */
  def featuresOf(assetId: Long, format: String, rate: Int, channels: Int,
                 ss: Array[Short]): AudioFeatures = {
    var sumSq = 0L
    var peak = 0
    var zc = 0L
    var i = 0
    while (i < ss.length) {
      val s = ss(i).toInt
      sumSq += s.toLong * s
      val abs = math.abs(s)
      if (abs > peak) peak = abs
      if (i > 0 && ((ss(i - 1) >= 0) != (s >= 0))) zc += 1
      i += 1
    }
    val n = ss.length
    AudioFeatures(assetId, format, rate, channels, n.toLong,
      (n / channels).toDouble / rate,
      if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n), peak, zc)
  }

  /** Fixed-size analysis frames over the decoded stream (first `maxFrames`
    * frames of `frameSize` samples; the tail frame may be partial): the
    * framing a VAD / loudness stage consumes, emitted as rows so frames of
    * one asset can be filtered/joined independently downstream. */
  def frameFeatures(a: MediaAsset, frameSize: Int, maxFrames: Int): Seq[AudioFrame] = {
    val (_, _, ss) = decode(a.payload)
    val nFrames = math.min((ss.length + frameSize - 1) / frameSize, maxFrames)
    (0 until nFrames).map { f =>
      val from = f * frameSize
      val until = math.min(from + frameSize, ss.length)
      var sumSq = 0L
      var peak = 0
      var i = from
      while (i < until) {
        val s = ss(i).toInt
        sumSq += s.toLong * s
        val abs = math.abs(s)
        if (abs > peak) peak = abs
        i += 1
      }
      val n = until - from
      AudioFrame(a.asset_id, f, n, math.sqrt(sumSq.toDouble / n), peak)
    }
  }
}
