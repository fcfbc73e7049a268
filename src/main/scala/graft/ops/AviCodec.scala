package graft.ops

/** A parsed MJPEG/AVI container: stream geometry plus the per-frame JPEG
  * payloads in presentation order. `rate`/`scale` carry the AVI fractional
  * frame rate (fps = rate/scale). */
final case class AviVideo(width: Int, height: Int, rate: Int, scale: Int,
                          frames: IndexedSeq[Array[Byte]])

/** REAL MJPEG/AVI container codec — pure-JVM byte-level encode/decode of
  * the RIFF AVI layout (the public Microsoft "AVI RIFF File Reference"):
  * `LIST hdrl` holding `avih` (MainAVIHeader) and a `LIST strl` with
  * `strh` ('vids'/'MJPG' AVIStreamHeader) + `strf` (BITMAPINFOHEADER),
  * then `LIST movi` holding one `00dc` chunk per frame — each frame a
  * genuine baseline JPEG decoded by [[JpegCodec]]. The RIFF even-byte
  * chunk padding rule applies throughout (same walk discipline as
  * [[WavCodec]]; JPEG frames are routinely odd-sized, so the pad byte is
  * exercised constantly, not occasionally).
  *
  * This promotes the VIDEO family off [[FakeDecoder]]: container walk +
  * per-frame intra-coded decode is exactly what a frame-sampling pipeline
  * stage does. Only inter-frame codecs (H.264-class, which genuinely need
  * native decoders) remain stubbed.
  *
  * The decoder is a chunk WALK, not a fixed-offset parse: unknown chunks
  * (`idx1`, `JUNK`, vendor metadata, non-video streams like `01wb` audio)
  * are skipped, because real-world AVIs carry them and a fixed-layout
  * assumption mis-reads frames. Malformed payloads fail loudly. */
object AviCodec {

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode grayscale-baseline-JPEG frames as a standards-shaped MJPEG AVI
    * (one 'vids' stream, fps = rate/scale). When `junkChunks` is set, an
    * odd-sized `JUNK` chunk is placed between `hdrl` and `movi` and an
    * `idx1` index chunk after `movi` — decoders that fixed-offset parse or
    * drop the RIFF even-padding rule break on exactly such files. */
  def encode(w: Int, h: Int, rate: Int, scale: Int,
             frames: Seq[Array[Byte]], junkChunks: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "need positive dimensions")
    require(rate > 0 && scale > 0, "need a positive fractional frame rate")
    require(frames.nonEmpty, "need at least one frame")
    val maxFrame = frames.map(_.length).max
    val junkBody = 7 // odd on purpose: forces the pad byte
    val junkSize = if (junkChunks) 8 + junkBody + 1 else 0
    val idx1Size = if (junkChunks) 8 + 16 * frames.length else 0
    val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val strlBody = 4 + (8 + 56) + (8 + 40)          // 'strl' + strh + strf
    val hdrlBody = 4 + (8 + 56) + (8 + strlBody)    // 'hdrl' + avih + LIST strl
    val riffBody = 4 + (8 + hdrlBody) + junkSize + (8 + moviBody) + idx1Size
    val buf = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(cc("RIFF")).putInt(riffBody).put(cc("AVI "))
    // ---- LIST hdrl
    buf.put(cc("LIST")).putInt(hdrlBody).put(cc("hdrl"))
    buf.put(cc("avih")).putInt(56)
      .putInt((1000000L * scale / rate).toInt) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)           // maxBytesPerSec, padding, flags
      .putInt(frames.length)                   // dwTotalFrames
      .putInt(0).putInt(1)                     // initialFrames, dwStreams
      .putInt(maxFrame)                        // suggestedBufferSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    buf.put(cc("LIST")).putInt(strlBody).put(cc("strl"))
    buf.put(cc("strh")).putInt(56)
      .put(cc("vids")).put(cc("MJPG"))
      .putInt(0)                               // dwFlags
      .putShort(0).putShort(0)                 // priority, language
      .putInt(0)                               // initialFrames
      .putInt(scale).putInt(rate)              // dwScale, dwRate
      .putInt(0).putInt(frames.length)         // dwStart, dwLength (frames)
      .putInt(maxFrame).putInt(0).putInt(0)    // bufSize, quality, sampleSize
      .putShort(0).putShort(0)                 // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort) // rcFrame right, bottom
    buf.put(cc("strf")).putInt(40)
      .putInt(40).putInt(w).putInt(h)          // biSize, biWidth, biHeight
      .putShort(1).putShort(24)                // biPlanes, biBitCount
      .put(cc("MJPG"))                         // biCompression
      .putInt(w * h * 3)                       // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0) // ppm x/y, clrUsed, clrImportant
    if (junkChunks) {
      buf.put(cc("JUNK")).putInt(junkBody)
      var i = 0
      while (i < junkBody) { buf.put(0x6a.toByte); i += 1 }
      buf.put(0.toByte) // RIFF pad to even
    }
    // ---- LIST movi
    buf.put(cc("LIST")).putInt(moviBody).put(cc("movi"))
    frames.foreach { f =>
      buf.put(cc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte) // RIFF even padding
    }
    if (junkChunks) {
      // idx1: one AVIINDEXENTRY per frame (ckid, flags, offset, size) —
      // realism only; the decoder walks movi directly and skips this
      buf.put(cc("idx1")).putInt(16 * frames.length)
      var off = 4 // offsets are movi-relative, counted from the 'movi' fourcc
      frames.foreach { f =>
        buf.put(cc("00dc")).putInt(0x10 /* AVIIF_KEYFRAME */)
          .putInt(off).putInt(f.length)
        off += 8 + f.length + (f.length & 1)
      }
    }
    buf.array()
  }

  /** Parse an MJPEG AVI payload. Walks the chunk tree (even-size padding
    * honored), validates magics and the 'vids'/'MJPG' stream contract,
    * collects `00dc`/`00db` frame chunks in order, skips everything else
    * (`idx1`, `JUNK`, audio streams, vendor chunks). */
  def decode(payload: Array[Byte]): AviVideo = {
    require(payload.length >= 12, "truncated RIFF header")
    def fourcc(off: Int) = new String(payload, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "AVI ", "not an AVI payload")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1; var rate = -1; var scale = -1
    // stream numbers follow strl DECLARATION order — an AVI with [auds,
    // vids] stores frames as '01dc', so the video stream's index must be
    // learned from the header walk, not hard-coded to 00
    var streamsSeen = 0
    var vidStream = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fourcc(pos)
        val size = buf.getInt(pos + 4)
        // bound in Long: a hostile size near Int.MaxValue overflows the
        // Int sum negative and would pass the check, surfacing later as a
        // raw ArrayIndexOutOfBoundsException instead of this message
        require(size >= 0 && pos.toLong + 8 + size <= to, s"chunk '$id' overruns payload")
        val body = pos + 8
        id match {
          case "LIST" =>
            require(size >= 4, "LIST chunk too small")
            val listType = fourcc(body)
            // hdrl/strl carry headers, movi carries frames; other list
            // types (INFO, odml…) are metadata — skipped whole
            if (listType == "hdrl" || listType == "strl" || listType == "movi")
              walk(body + 4, body + size, inMovi || listType == "movi")
          case "avih" =>
            require(size >= 56, "avih chunk too small")
            w = buf.getInt(body + 32); h = buf.getInt(body + 36)
            require(w > 0 && h > 0, "invalid avih geometry")
          case "strh" =>
            // only the video stream's header constrains this codec; other
            // stream types (auds…) may coexist and are skipped
            if (fourcc(body) == "vids") {
              require(vidStream < 0, "multiple video streams unsupported")
              require(fourcc(body + 4) == "MJPG",
                s"only MJPG video supported, got '${fourcc(body + 4)}'")
              vidStream = streamsSeen
              scale = buf.getInt(body + 20); rate = buf.getInt(body + 24)
              require(scale > 0 && rate > 0, "invalid strh frame rate")
            }
            streamsSeen += 1
          case vid if inMovi && vidStream >= 0 &&
              vid == f"$vidStream%02ddc" =>
            frames += java.util.Arrays.copyOfRange(payload, body, body + size)
          case vid if inMovi && vidStream >= 0 &&
              vid == f"$vidStream%02ddb" =>
            frames += java.util.Arrays.copyOfRange(payload, body, body + size)
          case _ => () // idx1 / JUNK / audio data / vendor chunks: skip
        }
        pos = body + size + (size & 1) // RIFF pads chunks to even offsets
      }
    }
    walk(12, payload.length, inMovi = false)
    require(w > 0 && h > 0, "no avih header")
    require(rate > 0 && scale > 0, "no vids strh header")
    require(frames.nonEmpty, "no frame chunks in movi")
    AviVideo(w, h, rate, scale, frames.toIndexedSeq)
  }
}
