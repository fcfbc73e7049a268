package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG codec — pure-JVM encode/decode of 8-bit GRAYSCALE (color type
  * 0) PNG, the third genuinely-decodable format beside [[BmpCodec]] and
  * [[WavCodec]]. Unlike BMP/WAV this format is COMPRESSED and CHECKSUMMED,
  * so the decode path exercises machinery a fixed-layout parse never
  * touches: the 8-byte signature, a length/type/data/CRC32 chunk walk with
  * per-chunk integrity verification, multi-chunk IDAT reassembly (the spec
  * allows the compressed stream to be split arbitrarily — the encoder
  * deliberately splits it so a concatenation bug cannot hide), a full
  * INFLATE of the scanline stream, and per-row UNFILTERING of all five
  * standard filter types (None/Sub/Up/Average/Paeth, each with the exact
  * mod-256 + floor/Paeth-predictor arithmetic of the spec). Grayscale also
  * comes in 16-bit (big-endian samples, bpp = 2 filter offsets — the
  * scientific-imaging shape) and both gray depths support Adam7
  * interlacing (interlace method 1: seven passes, each filtered and
  * unfiltered as an independent image, then scattered to the pixel grid).
  *
  * Everything here is the public PNG file format (RFC 2083 / ISO 15948);
  * the reference has no image code — this is an LLM-pipeline extension
  * (SURVEY.md §2.5 multimodal family). Malformed payloads fail LOUDLY
  * (signature, CRC, header fields, inflated length are all checked):
  * garbage stats from a half-parsed image are corpus poison at 100 TB. */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4, s"chunk type must be 4 bytes: $typ")
    val crc = new CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Paeth predictor (PNG spec §6.6) — byte-exact integer arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter the scanlines of a `w`×`h` image with `bpp` bytes per pixel
    * (PNG spec §6: the "left" neighbor is the corresponding byte of the
    * previous PIXEL, i.e. `bpp` bytes back — one filter machinery serves
    * grayscale, truecolor and palette). */
  private def filterScanlines(w: Int, h: Int, bpp: Int, data: Array[Byte],
                              filterType: Int): Array[Byte] = {
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = data(y * stride + x) & 0xff
        val left = if (x >= bpp) data(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) data((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (x >= bpp && y > 0) data((y - 1) * stride + x - bpp) & 0xff else 0
        val f = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** DEFLATE the filtered scanline stream and split it across two IDAT
    * chunks whenever it is ≥2 bytes (decoder concat coverage). */
  private def idatChunks(raw: Array[Byte]): Seq[Array[Byte]] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = out.toByteArray
    if (z.length >= 2) {
      val mid = z.length / 2
      Seq(chunk("IDAT", z.slice(0, mid)), chunk("IDAT", z.slice(mid, z.length)))
    } else Seq(chunk("IDAT", z))
  }

  /** Adam7 pass grid (PNG spec §8.2): (xStart, yStart, xStep, yStep) per
    * pass, in transmission order. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def passDims(w: Int, h: Int, p: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = p
    (if (w > x0) (w - x0 + dx - 1) / dx else 0,
     if (h > y0) (h - y0 + dy - 1) / dy else 0)
  }

  /** Serialize the filtered scanline stream for interlace method 1: each
    * Adam7 pass is extracted as its OWN little image and filtered
    * independently (per spec, the previous-scanline neighbor of a pass row
    * is the pass's own previous row, NOT an adjacent image row); empty
    * passes transmit nothing. */
  private def filterAdam7(w: Int, h: Int, bpp: Int, data: Array[Byte],
                          filterType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (p <- Adam7) {
      val (x0, y0, dx, dy) = p
      val (pw, ph) = passDims(w, h, p)
      if (pw > 0 && ph > 0) {
        val sub = new Array[Byte](pw * ph * bpp)
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            val srcOff = ((y0 + py * dy) * w + x0 + px * dx) * bpp
            System.arraycopy(data, srcOff, sub, (py * pw + px) * bpp, bpp)
            px += 1
          }
          py += 1
        }
        out.write(filterScanlines(pw, ph, bpp, sub, filterType))
      }
    }
    out.toByteArray
  }

  private def assemble(w: Int, h: Int, colorType: Int, bpp: Int,
                       data: Array[Byte], plte: Option[Array[Byte]],
                       filterType: Int, depth: Int = 8,
                       interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(data.length == w * h * bpp,
      s"need ${w * h * bpp} bytes, got ${data.length}")
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0,
        if (interlaced) 1 else 0)
    val raw = if (interlaced) filterAdam7(w, h, bpp, data, filterType)
              else filterScanlines(w, h, bpp, data, filterType)
    Signature ++ chunk("IHDR", ihdr) ++
      plte.map(p => chunk("PLTE", p)).getOrElse(Array.emptyByteArray) ++
      idatChunks(raw).reduce(_ ++ _) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Encode row-major 8-bit grayscale (color type 0) as a
    * standards-conformant PNG. `filterType` selects the per-row filter
    * (0–4) so round-trip tests can drive every unfilter branch;
    * `interlaced` writes Adam7 (interlace method 1). */
  def encode(w: Int, h: Int, gray: Array[Byte], filterType: Int = 0,
             interlaced: Boolean = false): Array[Byte] =
    assemble(w, h, 0, 1, gray, None, filterType, interlaced = interlaced)

  /** Encode row-major 16-bit grayscale (color type 0, bit depth 16 — the
    * scientific/medical-imaging shape) as a standards-conformant PNG.
    * Samples are big-endian per spec; filters operate on BYTES with the
    * "left" neighbor one whole pixel (2 bytes) back. Values 0..65535. */
  def encodeGray16(w: Int, h: Int, gray: Array[Int], filterType: Int = 0,
                   interlaced: Boolean = false): Array[Byte] = {
    require(gray.length == w * h, s"need ${w * h} samples, got ${gray.length}")
    val bytes = new Array[Byte](w * h * 2)
    var i = 0
    while (i < gray.length) {
      val v = gray(i)
      require(v >= 0 && v <= 0xffff, s"16-bit sample out of range: $v")
      bytes(2 * i) = (v >>> 8).toByte
      bytes(2 * i + 1) = (v & 0xff).toByte
      i += 1
    }
    assemble(w, h, 0, 2, bytes, None, filterType, depth = 16,
      interlaced = interlaced)
  }

  /** Encode row-major 8-bit RGB triples (color type 2, bpp = 3) — the
    * format real corpora actually carry. Same filter machinery as
    * grayscale with the spec's bpp-offset "left" neighbor. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte], filterType: Int = 0): Array[Byte] =
    assemble(w, h, 2, 3, rgb, None, filterType)

  /** Encode row-major 16-bit RGB triples (color type 2, bit depth 16 —
    * the deep-color/scanner shape; the last PNG depth face). Channel
    * values 0..65535, big-endian per spec; filters operate on BYTES with
    * the "left" neighbor one whole pixel (bpp = 6 bytes) back — the
    * widest filter offset the spec defines. */
  def encodeRgb16(w: Int, h: Int, rgb: Array[Int], filterType: Int = 0,
                  interlaced: Boolean = false): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} samples, got ${rgb.length}")
    val bytes = new Array[Byte](rgb.length * 2)
    var i = 0
    while (i < rgb.length) {
      val v = rgb(i)
      require(v >= 0 && v <= 0xffff, s"16-bit sample out of range: $v")
      bytes(2 * i) = (v >>> 8).toByte
      bytes(2 * i + 1) = (v & 0xff).toByte
      i += 1
    }
    assemble(w, h, 2, 6, bytes, None, filterType, depth = 16,
      interlaced = interlaced)
  }

  /** Encode 8-bit palette indices (color type 3) with the given PLTE of
    * RGB triples (≤256 entries). Filters apply to the INDEX bytes
    * (bpp = 1), per spec. */
  def encodePalette(w: Int, h: Int, indices: Array[Byte],
                    palette: Array[Byte], filterType: Int = 0): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 256 * 3, s"bad palette length ${palette.length}")
    assemble(w, h, 3, 1, indices, Some(palette), filterType)
  }

  /** Decoded image before palette expansion: `px` holds the unfiltered
    * bytes (bpp = 3 for truecolor-8, 2 for grayscale-16 big-endian, 1 for
    * grayscale-8/palette); `plte` is the PLTE chunk's RGB triples for
    * color type 3; `depth` is the bit depth (8 or 16). */
  final case class RawImage(w: Int, h: Int, colorType: Int,
                            px: Array[Byte], plte: Array[Byte],
                            depth: Int = 8)

  /** Reverse one image's per-row filters: `raw` holds `h` scanlines of
    * `1 + w*bpp` bytes starting at `off`. Returns the `w*h*bpp` pixel
    * bytes. Shared by the sequential path (one whole-image call) and the
    * Adam7 path (one call per pass — per spec each pass unfilters as an
    * independent image). */
  private def unfilterImage(raw: Array[Byte], off: Int, w: Int, h: Int,
                            bpp: Int): Array[Byte] = {
    val stride = w * bpp
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(off + y * (stride + 1)) & 0xff
      require(ft <= 4, s"bad PNG filter type $ft in row $y")
      var x = 0
      while (x < stride) {
        val f = raw(off + y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, upLeft)
        }
        px(y * stride + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** Full chunk walk + inflate + unfilter for color types 0 (grayscale-8),
    * 2 (truecolor RGB8) and 3 (palette-8). CRC-verifies every chunk
    * (ancillary chunks are skipped after their CRC check), concatenates
    * multi-IDAT zlib streams, and reverses every row's filter per its tag
    * with the spec's bpp-offset "left" neighbor. */
  def decodeRaw(payload: Array[Byte]): RawImage = {
    require(payload.length >= Signature.length + 12 &&
      payload.take(8).sameElements(Signature), "not a PNG payload")
    var off = 8
    var w = 0; var h = 0; var colorType = -1
    var depth = 0; var interlace = 0
    var sawIhdr = false; var sawIend = false
    var plte: Array[Byte] = Array.emptyByteArray
    val zstream = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      require(off + 8 <= payload.length, "truncated PNG chunk header")
      val len = readBe32(payload, off)
      require(len >= 0 && off + 12 + len <= payload.length,
        s"truncated PNG chunk body (len=$len at $off)")
      val typ = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(payload, off + 4, 4 + len)
      require(crc.getValue.toInt == readBe32(payload, off + 8 + len),
        s"PNG CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!sawIhdr && len == 13, "bad IHDR")
          w = readBe32(payload, off + 8); h = readBe32(payload, off + 12)
          require(w > 0 && h > 0, s"bad PNG dims ${w}x$h")
          depth = payload(off + 16) & 0xff; colorType = payload(off + 17)
          require((depth == 8 && (colorType == 0 || colorType == 2 || colorType == 3)) ||
                  (depth == 16 && (colorType == 0 || colorType == 2)),
            s"only gray-8/RGB-8/palette-8/gray-16/RGB-16 supported (depth=$depth color=$colorType)")
          require(payload(off + 18) == 0 && payload(off + 19) == 0,
            "unsupported compression/filter method")
          interlace = payload(off + 20) & 0xff
          require(interlace == 0 || interlace == 1,
            s"unsupported interlace method $interlace")
          sawIhdr = true
        case "PLTE" =>
          require(sawIhdr, "PLTE before IHDR")
          require(len % 3 == 0 && len >= 3 && len <= 256 * 3, s"bad PLTE length $len")
          plte = java.util.Arrays.copyOfRange(payload, off + 8, off + 8 + len)
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          zstream.write(payload, off + 8, len)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunk: CRC checked above, body skipped
      }
      off += 12 + len
    }
    require(sawIhdr, "missing IHDR")
    require(colorType != 3 || plte.nonEmpty, "palette PNG missing PLTE")
    val bpp = (if (colorType == 2) 3 else 1) * (depth / 8)
    val rawLen =
      if (interlace == 0) (w * bpp + 1) * h
      else Adam7.map { p =>
        val (pw, ph) = passDims(w, h, p)
        if (pw > 0 && ph > 0) (pw * bpp + 1) * ph else 0
      }.sum
    val inflater = new Inflater()
    inflater.setInput(zstream.toByteArray)
    val raw = new Array[Byte](rawLen)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      require(n > 0 || inflater.finished(), "stalled PNG inflate")
      got += n
    }
    require(got == raw.length && inflater.inflate(new Array[Byte](1)) == 0,
      s"PNG scanline stream length mismatch (got $got, want ${raw.length})")
    inflater.end()
    val px =
      if (interlace == 0) unfilterImage(raw, 0, w, h, bpp)
      else {
        // Adam7: unfilter each pass as its own image, then scatter its
        // pixels to their grid positions
        val full = new Array[Byte](w * bpp * h)
        var off2 = 0
        for (p <- Adam7) {
          val (x0, y0, dx, dy) = p
          val (pw, ph) = passDims(w, h, p)
          if (pw > 0 && ph > 0) {
            val sub = unfilterImage(raw, off2, pw, ph, bpp)
            var py = 0
            while (py < ph) {
              var sx = 0
              while (sx < pw) {
                System.arraycopy(sub, (py * pw + sx) * bpp,
                  full, ((y0 + py * dy) * w + x0 + sx * dx) * bpp, bpp)
                sx += 1
              }
              py += 1
            }
            off2 += (pw * bpp + 1) * ph
          }
        }
        full
      }
    RawImage(w, h, colorType, px, plte, depth)
  }

  /** Parse a grayscale-8 PNG back into (width, height, row-major pixels). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = decodeRaw(payload)
    require(img.colorType == 0 && img.depth == 8,
      s"decode expects grayscale-8, got color type ${img.colorType} depth ${img.depth}")
    (img.w, img.h, img.px)
  }

  /** Parse a grayscale-16 PNG back into (width, height, row-major samples
    * 0..65535) — big-endian byte pairs reassembled per spec. */
  def decodeGray16(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = decodeRaw(payload)
    require(img.colorType == 0 && img.depth == 16,
      s"decodeGray16 expects grayscale-16, got color type ${img.colorType} depth ${img.depth}")
    val vs = new Array[Int](img.w * img.h)
    var i = 0
    while (i < vs.length) {
      vs(i) = ((img.px(2 * i) & 0xff) << 8) | (img.px(2 * i + 1) & 0xff)
      i += 1
    }
    (img.w, img.h, vs)
  }

  /** Parse a 16-bit truecolor PNG back into (width, height, row-major
    * RGB channel samples 0..65535) — big-endian byte pairs reassembled
    * per spec, 3 samples per pixel. */
  def decodeRgb16(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = decodeRaw(payload)
    require(img.colorType == 2 && img.depth == 16,
      s"decodeRgb16 expects truecolor-16, got color type ${img.colorType} depth ${img.depth}")
    val vs = new Array[Int](img.w * img.h * 3)
    var i = 0
    while (i < vs.length) {
      vs(i) = ((img.px(2 * i) & 0xff) << 8) | (img.px(2 * i + 1) & 0xff)
      i += 1
    }
    (img.w, img.h, vs)
  }

  /** Parse any supported PNG into (width, height, row-major RGB triples):
    * truecolor passes through, palette indices expand through the PLTE
    * (out-of-range indices fail loudly), grayscale replicates each plane
    * byte across the three channels. */
  def decodeRgb(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = decodeRaw(payload)
    (img.w, img.h, rgbOf(img))
  }

  /** RGB triples of an already-decoded image (no re-parse): truecolor
    * passes through, palette expands, grayscale replicates each plane
    * byte across the three channels. */
  def rgbOf(img: RawImage): Array[Byte] = img.colorType match {
    case _ if img.depth != 8 => throw new IllegalArgumentException(
      s"rgbOf expects 8-bit channels, got depth ${img.depth}")
    case 2 => img.px
    case 3 => expandPalette(img)
    case 0 =>
      val rgb = new Array[Byte](img.px.length * 3)
      var i = 0
      while (i < img.px.length) {
        rgb(i * 3) = img.px(i); rgb(i * 3 + 1) = img.px(i)
        rgb(i * 3 + 2) = img.px(i); i += 1
      }
      rgb
    case ct => throw new IllegalArgumentException(
      s"unsupported color type $ct")
  }

  /** REAL nearest-neighbor resize on the decoded grayscale plane —
    * dst(x,y) = src(x·stride, y·stride), dims ceil-divided — fused with
    * the stats of the RESIZED pixels (same contract as
    * [[BmpCodec.resizeFeatures]]; here the source pixels first pass
    * through the full inflate+unfilter path). */
  def resizeFeatures(a: MediaAsset, stride: Int): ResizedFeatures = {
    val (w, h, px) = decode(a.payload)
    val dw = (w + stride - 1) / stride
    val dh = (h + stride - 1) / stride
    var sum = 0L
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        sum += px((y * stride) * w + x * stride) & 0xff
        x += 1
      }
      y += 1
    }
    val n = dw.toLong * dh
    ResizedFeatures(a.asset_id, a.format, dw, dh, n,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Feature stats of the DECODED pixels — same output contract as
    * [[BmpCodec.decodeFeatures]], over the inflated+unfiltered pixel
    * stream of ANY supported color type (grayscale plane, RGB byte
    * stream, or palette-expanded RGB), so a chunk/CRC/inflate/filter/PLTE
    * bug anywhere above breaks the oracle match. */
  /** Expand palette indices through the PLTE into RGB triples (shared by
    * [[decodeRgb]] and [[decodeFeatures]] so the payload is parsed ONCE). */
  private def expandPalette(img: RawImage): Array[Byte] = {
    val n = img.plte.length / 3
    val rgb = new Array[Byte](img.px.length * 3)
    var i = 0
    while (i < img.px.length) {
      val idx = img.px(i) & 0xff
      require(idx < n, s"palette index $idx out of range (PLTE has $n entries)")
      rgb(i * 3) = img.plte(idx * 3)
      rgb(i * 3 + 1) = img.plte(idx * 3 + 1)
      rgb(i * 3 + 2) = img.plte(idx * 3 + 2)
      i += 1
    }
    rgb
  }

  def decodeFeatures(a: MediaAsset): MediaFeatures = {
    val img = decodeRaw(a.payload)
    require(img.depth == 8,
      s"decodeFeatures is byte-stat shaped; 16-bit images go through decodeGray16")
    val px = if (img.colorType == 3) expandPalette(img) else img.px
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
}
