package graft.ops

/** MP3 FRAME-HEADER walk — the honest metadata face of the perceptual
  * audio family. The repo's stance on perceptual codecs is unchanged
  * (psychoacoustic DECODE stays behind the clearly-labeled FakeDecoder —
  * a real MDCT/huffman pipeline is out of sandbox scope), but a 100 TB
  * corpus audit doesn't decode: it walks FRAME HEADERS to get duration /
  * bitrate / sample-rate distributions, and that walk is pure public
  * arithmetic (the MPEG-1 audio header layout and its bitrate/samplerate
  * tables): 11-bit sync, version/layer bits, table-indexed bitrate and
  * sample rate, padding bit, frameLen = 144·bitrate/sampleRate + padding,
  * 1152 samples per Layer III frame; an ID3v2 prefix (synchsafe 28-bit
  * size) is skipped by size.
  *
  * Loud-failure contract: bad sync, reserved version/layer/bitrate/
  * samplerate codes, a frame overrunning the stream, or trailing garbage
  * all throw. Subset: MPEG-1 Layer III, protection bit 1 (no CRC) —
  * out-of-subset conforming streams reject loudly, never mis-measure. */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table (kbit/s), index 1..14; 0 = free
    * (rejected), 15 = reserved (rejected). */
  val BitrateKbps: Array[Int] =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0..2; 3 = reserved (rejected). */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  val SamplesPerFrame = 1152

  private def frameLen(kbps: Int, rate: Int, padding: Int): Int =
    144 * (kbps * 1000) / rate + padding

  /** One frame: 4-byte header + deterministic filler to the frame length. */
  private def frame(kbps: Int, rate: Int, padding: Int, seed: Int): Array[Byte] = {
    val bIdx = BitrateKbps.indexOf(kbps)
    val rIdx = SampleRates.indexOf(rate)
    require(bIdx >= 1 && rIdx >= 0, s"mp3: fixture rate/bitrate ($kbps,$rate)")
    val len = frameLen(kbps, rate, padding)
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte // sync(3) | MPEG-1 (11) | Layer III (01) | no CRC (1)
    out(2) = ((bIdx << 4) | (rIdx << 2) | (padding << 1)).toByte
    out(3) = 0xc0.toByte // mode: single channel; rest zero
    var i = 4
    while (i < len) { out(i) = ((seed + i) % 251).toByte; i += 1 }
    out
  }

  /** Serialize an asset: optional ID3v2.3 prefix + `nFrames` constant-
    * bitrate frames whose padding bit on frame f is `pad(f)`. */
  def encode(kbps: Int, rate: Int, nFrames: Int, pad: Int => Int,
             id3Bytes: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      require(id3Bytes < (1 << 28), "mp3: ID3 size overflow")
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0) // v2.3.0
      out.write(0)               // flags
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      (0 until id3Bytes).foreach(i => out.write(i % 127))
    }
    (0 until nFrames).foreach { f =>
      val b = frame(kbps, rate, pad(f), f)
      out.write(b, 0, b.length)
    }
    out.toByteArray
  }

  /** Header-walk scan. Returns (nFrames, kbps of the first frame,
    * sampleRate, totalBytes of the frame section, id3Bytes skipped). */
  def scan(payload: Array[Byte]): (Int, Int, Int, Long, Long) = {
    var pos = 0
    var id3 = 0L
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      require((payload(5) & 0x80) == 0, "mp3: ID3 unsynchronisation not implemented")
      val size = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      require((payload(6) | payload(7) | payload(8) | payload(9)) >= 0 &&
        ((payload(6) & 0x80) | (payload(7) & 0x80) | (payload(8) & 0x80) |
          (payload(9) & 0x80)) == 0, "mp3: non-synchsafe ID3 size")
      pos = 10 + size
      id3 = (10 + size).toLong
      require(pos <= payload.length, "mp3: ID3 tag overruns the stream")
    }
    var nFrames = 0
    var kbps0 = -1
    var rate0 = -1
    val frameStart = pos
    while (pos < payload.length) {
      require(pos + 4 <= payload.length, s"mp3: truncated frame header at $pos")
      val h0 = payload(pos) & 0xff
      val h1 = payload(pos + 1) & 0xff
      require(h0 == 0xff && (h1 & 0xe0) == 0xe0, s"mp3: bad frame sync at $pos")
      require((h1 & 0x18) == 0x18, "mp3: only MPEG-1 implemented")
      require((h1 & 0x06) == 0x02, "mp3: only Layer III implemented")
      require((h1 & 0x01) == 0x01, "mp3: CRC-protected frames not implemented")
      val h2 = payload(pos + 2) & 0xff
      val bIdx = (h2 >> 4) & 0xf
      require(bIdx >= 1 && bIdx <= 14, s"mp3: bad bitrate index $bIdx at $pos")
      val rIdx = (h2 >> 2) & 0x3
      require(rIdx <= 2, s"mp3: reserved sample-rate index at $pos")
      val padding = (h2 >> 1) & 1
      val kbps = BitrateKbps(bIdx)
      val rate = SampleRates(rIdx)
      if (nFrames == 0) { kbps0 = kbps; rate0 = rate }
      else {
        require(rate == rate0, "mp3: sample-rate change mid-stream not implemented")
        // a VBR stream summarized by its first frame's kbps would be
        // mis-reported as CBR — reject per the strict-subset stance
        require(kbps == kbps0, "mp3: bitrate change mid-stream not implemented")
      }
      val len = frameLen(kbps, rate, padding)
      require(pos + len <= payload.length, s"mp3: frame at $pos overruns the stream")
      pos += len
      nFrames += 1
    }
    require(nFrames > 0, "mp3: no frames")
    (nFrames, kbps0, rate0, (pos - frameStart).toLong, id3)
  }
}
