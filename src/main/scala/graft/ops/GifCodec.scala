package graft.ops

/** REAL GIF codec — pure-JVM byte-level encode/decode of the GIF89a layout
  * (the public W3C/CompuServe specification): logical screen descriptor,
  * global color table, extension blocks skipped via the sub-block walk,
  * image descriptor, and the actual variable-width LZW entropy coder
  * (LSB-first bit packing, clear/EOI codes, 4096-entry dictionary with the
  * KwKwK special case, code width growing at dictionary-size boundaries
  * with the decoder lagging the encoder by exactly one entry).
  *
  * Grayscale subset on the ENCODE side (a 256-entry (i,i,i) palette — the
  * fixture's shape; an optional LOCAL color table with entry
  * j = (j, 7j mod 256, 13j mod 256) overrides it per image descriptor,
  * per spec); the DECODER handles any global or local color table and
  * returns the palette-expanded grayscale via the integer luma the other
  * codecs use. INTERLACED images transport rows in the spec's four-pass
  * order (rows 0,8,16…; 4,12…; 2,6…; 1,3,5…) and the decoder scatters
  * them back — transport-only, decoded pixels identical, so a decoder
  * that ignores the flag produces row-permuted output the
  * position-sensitive oracle rejects. Like PNG, the compression
  * round-trip is LOSSLESS, so decoded pixels are exactly the source and
  * an oracle can recompute decoded-pixel stats from the tiling
  * arithmetic alone — the whole LZW path has to be right for the value
  * match to hold. */
object GifCodec {

  private val MaxCode = 4096 // 12-bit ceiling fixed by the spec

  /** The four-pass interlace row schedule: target row index of each
    * transmitted row, in transmission order (GIF89a appendix E). */
  def interlaceRows(h: Int): Array[Int] =
    (Seq.range(0, h, 8) ++ Seq.range(4, h, 8) ++
     Seq.range(2, h, 4) ++ Seq.range(1, h, 2)).toArray

  /** The local color table the LCT variant writes: entry j =
    * (j, 7j mod 256, 13j mod 256) — deliberately NOT the grayscale
    * identity, so a decoder that wrongly expands through the global
    * table produces different luma values. */
  def lctEntry(j: Int): (Int, Int, Int) = (j, (7 * j) % 256, (13 * j) % 256)

  /** Encode row-major 8-bit pixels as a GIF89a with a 256-entry grayscale
    * global color table and one comment extension (so every fixture
    * payload exercises the decoder's extension skip). The LZW stream is
    * the real adaptive-dictionary coder, not the no-compression trick.
    * `interlaced` transmits rows in the four-pass order; `localPalette`
    * writes the [[lctEntry]] table in the image descriptor (overriding
    * the GCT for this image, per spec). */
  def encode(w: Int, h: Int, px: Array[Byte], interlaced: Boolean = false,
             localPalette: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "bad dimensions")
    require(px.length == w * h, s"need ${w * h} pixels, got ${px.length}")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // comment extension: the decoder must walk sub-blocks it doesn't know
    out.write(0x21); out.write(0xfe)
    val comment = "graft".getBytes("US-ASCII")
    out.write(comment.length); out.write(comment); out.write(0)
    writeImage(out, w, h, px, interlaced, localPalette)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Encode an ANIMATED GIF89a: one grayscale-GCT logical screen, a
    * NETSCAPE 2.0 looping application extension (the block real animated
    * GIFs carry — the decoder's extension walk must skip its sub-blocks),
    * then per frame a Graphic Control Extension (disposal none, the
    * frame's delay in centiseconds, no transparency) followed by a
    * full-frame image descriptor + LZW data. `interlaced`/`localPalette`
    * apply to every frame (the per-frame LCT is the [[lctEntry]] table). */
  def encodeAnimated(w: Int, h: Int, frames: Seq[Array[Byte]],
                     delaysCs: Seq[Int], interlaced: Boolean = false,
                     localPalette: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty && frames.length == delaysCs.length,
      s"need one delay per frame: ${frames.length} vs ${delaysCs.length}")
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, "bad dimensions")
    frames.foreach(f => require(f.length == w * h,
      s"need ${w * h} pixels per frame, got ${f.length}"))
    delaysCs.foreach(d => require(d >= 0 && d <= 0xffff, s"bad delay $d"))
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // NETSCAPE 2.0 loop-forever extension
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(0); out.write(0)
    frames.zip(delaysCs).foreach { case (px, delay) =>
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0) // disposal none, no transparency
      u16(delay)
      out.write(0) // transparent index (unused)
      out.write(0) // block terminator
      writeImage(out, w, h, px, interlaced, localPalette)
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode EVERY frame of a (possibly animated) GIF: walk the block
    * stream to the trailer, tracking each frame's Graphic Control
    * Extension delay (0 when a frame carries none — legal for stills).
    * Returns (w, h, frames) with one (delay_cs, grayscale plane) per
    * image descriptor. Interlace and local color tables apply per frame
    * through the same single-image machinery as [[decode]]. */
  def decodeFrames(payload: Array[Byte]): (Int, Int, Seq[(Int, Array[Byte])]) = {
    require(payload.length >= 13, "truncated GIF header")
    val sig = new String(payload, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF payload: '$sig'")
    def u16(off: Int) = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    def at(p: Int): Int = {
      require(p < payload.length, "truncated GIF stream"); payload(p) & 0xff
    }
    val w = u16(6); val h = u16(8)
    val packed = payload(10) & 0xff
    // LCT-only GIFs are spec-legal: empty gct + per-frame LCT override
    // (see the decode() note — the bounds check keeps failure loud)
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var pos = 13
    require(pos + gctSize * 3 <= payload.length, "truncated color table")
    val gct = java.util.Arrays.copyOfRange(payload, pos, pos + gctSize * 3)
    pos += gctSize * 3
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var pendingDelay = 0
    var done = false
    while (!done) {
      at(pos) match {
        case 0x3b => done = true // trailer
        case 0x21 =>
          val label = at(pos + 1)
          if (label == 0xf9) { // GCE: delay for the NEXT image
            require(at(pos + 2) == 4, "bad GCE block size")
            // block: [size=4][packed][delay lo][delay hi][transp index]
            require(pos + 6 <= payload.length, "truncated GIF stream")
            pendingDelay = u16(pos + 4)
          }
          pos += 2 // introducer + label, then the sub-block walk
          while (at(pos) != 0) pos += 1 + at(pos)
          pos += 1
        case 0x2c =>
          val (px, next) = decodeImageAt(payload, pos, w, h, gct)
          frames += ((pendingDelay, px))
          pendingDelay = 0
          pos = next
        case b => throw new IllegalArgumentException(
          f"GIF: unexpected block 0x$b%02x at $pos")
      }
    }
    require(frames.nonEmpty, "GIF with no image data")
    (w, h, frames.toSeq)
  }

  /** Write one image's descriptor + optional LCT + (optionally
    * interlace-permuted) LZW data — ONE definition of the per-image wire
    * format, shared by the still encoder and every animation frame so the
    * two can never desynchronize. */
  private def writeImage(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
                         px: Array[Byte], interlaced: Boolean,
                         localPalette: Boolean): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(0x2c) // image descriptor, full frame
    u16(0); u16(0); u16(w); u16(h)
    out.write((if (localPalette) 0x87 else 0) | (if (interlaced) 0x40 else 0))
    if (localPalette) {
      var j = 0
      while (j < 256) {
        val (r, g, b) = lctEntry(j)
        out.write(r); out.write(g); out.write(b)
        j += 1
      }
    }
    val stream =
      if (!interlaced) px
      else { // rows in four-pass transmission order
        val t = new Array[Byte](px.length)
        val order = interlaceRows(h)
        var ri = 0
        while (ri < h) {
          System.arraycopy(px, order(ri) * w, t, ri * w, w)
          ri += 1
        }
        t
      }
    val mcs = 8
    out.write(mcs)
    out.write(lzwCompress(stream, mcs))
  }

  /** The GIF LZW coder: variable code width starting at mcs+1, CLEAR at
    * stream start and on dictionary overflow, EOI at end; the encoder
    * widens one entry LATER than the decoder (the decoder's dictionary
    * lags by one code — the spec's synchronization). Emitted as GIF data
    * sub-blocks (<=255 bytes each, zero terminator). */
  private def lzwCompress(px: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = mcs + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) { bits.write((bitBuf & 0xff).toInt); bitBuf >>= 8; bitCnt -= 8 }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int] // (prefixCode, byte) -> code
    var next = eoi + 1
    def reset(): Unit = { dict = scala.collection.mutable.HashMap.empty; next = eoi + 1; width = mcs + 1 }
    put(clear)
    var prefix = -1
    var i = 0
    while (i < px.length) {
      val c = px(i) & 0xff
      if (prefix < 0) prefix = c
      else dict.get((prefix, c)) match {
        case Some(code) => prefix = code
        case None =>
          put(prefix)
          dict((prefix, c)) = next
          next += 1
          // decoder widens at next == (1 << width); it lags one entry, so
          // the encoder widens one later — at next == (1 << width) + 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next == MaxCode) { put(clear); reset() }
          prefix = c
      }
      i += 1
    }
    if (prefix >= 0) put(prefix)
    put(eoi)
    if (bitCnt > 0) bits.write((bitBuf & 0xff).toInt)
    val raw = bits.toByteArray
    val blocks = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < raw.length) {
      val n = math.min(255, raw.length - off)
      blocks.write(n); blocks.write(raw, off, n)
      off += n
    }
    blocks.write(0)
    blocks.toByteArray
  }

  /** Decode a GIF payload to (w, h, grayscale pixels). The palette expands
    * through the same integer luma as [[MultimodalOps.imagePhash]]'s BMP
    * route ((299·r + 587·g + 114·b) / 1000), which for the grayscale GCT
    * is the identity. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 13, "truncated GIF header")
    val sig = new String(payload, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF payload: '$sig'")
    def u16(off: Int) = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    val packed = payload(10) & 0xff
    // a GIF carrying only per-image LOCAL color tables is spec-legal (the
    // GCT flag is optional) — pass an empty gct and let decodeImageAt's
    // LCT override / palette-index bounds check decide per frame: a frame
    // with NEITHER table fails loudly there, never decodes garbage
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var pos = 13
    require(pos + gctSize * 3 <= payload.length, "truncated color table")
    val gct = java.util.Arrays.copyOfRange(payload, pos, pos + gctSize * 3)
    pos += gctSize * 3
    def at(p: Int): Int = {
      require(p < payload.length, "truncated GIF stream"); payload(p) & 0xff
    }
    // block walk: skip extensions, find the image descriptor
    while (at(pos) == 0x21) {
      pos += 2 // extension introducer + label
      while (at(pos) != 0) pos += 1 + at(pos)
      pos += 1
    }
    require(at(pos) == 0x2c, "no image descriptor")
    val (px, _) = decodeImageAt(payload, pos, w, h, gct)
    (w, h, px)
  }

  /** Decode ONE image (descriptor at `pos`) of a GIF whose logical screen
    * is w×h with global color table `gct`: LCT override, optional
    * interlace scatter, LZW, palette-luma expansion. Returns the decoded
    * grayscale plane and the position just past the image's data
    * terminator — the single-image face ([[decode]]) calls it once, the
    * animation walk ([[decodeFrames]]) repeatedly. */
  private def decodeImageAt(payload: Array[Byte], pos0: Int, w: Int, h: Int,
                            gct: Array[Byte]): (Array[Byte], Int) = {
    var pos = pos0
    def at(p: Int): Int = {
      require(p < payload.length, "truncated GIF stream"); payload(p) & 0xff
    }
    def u16(off: Int) = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    require(pos + 10 <= payload.length, "truncated image descriptor")
    val iw = u16(pos + 5); val ih = u16(pos + 7)
    val ipacked = payload(pos + 9) & 0xff
    require(iw == w && ih == h, "sub-rectangle frames unsupported")
    pos += 10
    // a LOCAL color table overrides the global one for this image (spec
    // §20); size field is this descriptor's own, independent of the GCT's
    val pal = if ((ipacked & 0x80) != 0) {
      val lctSize = 2 << (ipacked & 7)
      require(pos + lctSize * 3 <= payload.length, "truncated local color table")
      val t = java.util.Arrays.copyOfRange(payload, pos, pos + lctSize * 3)
      pos += lctSize * 3
      t
    } else gct
    val interlaced = (ipacked & 0x40) != 0
    val mcs = at(pos)
    pos += 1
    // gather the LZW stream from the sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (at(pos) != 0) {
      val n = at(pos)
      require(pos.toLong + 1 + n <= payload.length, "truncated GIF sub-block")
      data.write(payload, pos + 1, n)
      pos += 1 + n
    }
    pos += 1 // data terminator
    val idx0 = lzwDecompress(data.toByteArray, mcs, w * h)
    // interlaced streams transmit rows in the four-pass order — scatter
    // them back to their raster positions (transport-only: the result is
    // identical to a non-interlaced coding of the same pixels)
    val idx =
      if (!interlaced) idx0
      else {
        val t = new Array[Byte](idx0.length)
        val order = interlaceRows(h)
        var ri = 0
        while (ri < h) {
          System.arraycopy(idx0, ri * w, t, order(ri) * w, w)
          ri += 1
        }
        t
      }
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val p = (idx(i) & 0xff) * 3
      require(p + 2 < pal.length, s"palette index ${idx(i) & 0xff} out of range")
      val (r, g, b) = (pal(p) & 0xff, pal(p + 1) & 0xff, pal(p + 2) & 0xff)
      px(i) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      i += 1
    }
    (px, pos)
  }

  /** Feature stats of the DECODED pixels — same contract as
    * [[PngCodec]]'s, over the LZW-decompressed palette-expanded plane. */
  def decodeFeatures(a: MediaAsset): MediaFeatures = {
    val (_, _, px) = decode(a.payload)
    val hist = new Array[Long](FakeDecoder.HistBuckets)
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val b = px(i) & 0xff
      hist(b * FakeDecoder.HistBuckets / 256) += 1
      sum += b
      i += 1
    }
    MediaFeatures(a.asset_id, a.format, px.length.toLong,
      if (px.length == 0) 0.0 else sum.toDouble / px.length, hist)
  }

  private def lzwDecompress(data: Array[Byte], mcs: Int, nPixels: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // dictionary as (prefix link, last byte) arrays — the standard compact form
    val prefix = new Array[Int](MaxCode)
    val last = new Array[Byte](MaxCode)
    var next = eoi + 1
    var width = mcs + 1
    var bitPos = 0
    def read(): Int = {
      require(bitPos + width <= data.length * 8, "LZW stream truncated")
      var v = 0
      var i = 0
      while (i < width) {
        val b = bitPos + i
        if ((data(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    def emit(code: Int): Byte = { // writes the code's expansion, returns its FIRST byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear + 2) { stack = last(c) :: stack; c = prefix(c) }
      require(c < clear, s"corrupt LZW code chain at $c")
      stack = c.toByte :: stack
      stack.foreach { b =>
        require(outPos < out.length, "LZW expands past the pixel count")
        out(outPos) = b; outPos += 1
      }
      stack.head
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == clear) { next = eoi + 1; width = mcs + 1; prev = -1 }
      else if (code == eoi) done = true
      else {
        require(code < next || (code == next && prev >= 0), s"bad LZW code $code")
        val first =
          if (code < next) emit(code)
          else { // KwKwK: the code being defined right now = prev + first(prev)
            val f = emit(prev)
            require(outPos < out.length, "LZW expands past the pixel count")
            out(outPos) = f; outPos += 1
            f
          }
        if (prev >= 0 && next < MaxCode) {
          prefix(next) = prev; last(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (outPos == nPixels && !done) {
        // consume the EOI the encoder always writes
        val tail = read()
        require(tail == eoi, s"expected EOI after the last pixel, got $tail")
        done = true
      }
    }
    require(outPos == nPixels, s"decoded $outPos of $nPixels pixels")
    out
  }

}
