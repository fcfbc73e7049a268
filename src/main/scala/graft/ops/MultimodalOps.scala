package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. The engine
  * treats media exactly like a 100 TB training pipeline would: payloads are
  * `binary` columns riding the columnar format (parquet keeps them
  * compressed and column-pruned away unless projected), metadata is a typed
  * struct usable in predicates WITHOUT touching the payload bytes. */
final case class MediaAsset(
    asset_id: Long, format: String, payload: Array[Byte],
    width: Int, height: Int, channels: Int, sample_rate: Int)

/** Decoded features of one asset (the stub decoder's output shape). */
final case class MediaFeatures(
    asset_id: Long, format: String, n_bytes: Long,
    mean_byte: Double, byte_hist: Array[Long])

/** Decoded features of one 16-bit grayscale image: sample count, mean
  * sample value (0..65535), the first ≤12 samples (position-sensitive —
  * catches a de-interlace that permutes pixels without changing the mean)
  * and a position-weighted checksum Σ v(i)·(i+1). */
final case class Gray16Features(
    asset_id: Long, format: String, n_px: Long, mean_val: Double,
    head: Array[Long], wsum: Long)

/** One decoded page of a multi-page TIFF with position-sensitive stats. */
final case class TiffPageFeatures(
    asset_id: Long, page_idx: Int, n_px: Long, mean_val: Double,
    head: Array[Long], wsum: Long)

/** One RESAMPLED audio clip's stats: source/target rates, sample counts
  * and position-sensitive features of the resampled signal. */
final case class AudioResampleFeatures(
    asset_id: Long, rate_in: Int, rate_out: Int, n_in: Long, n_out: Long,
    mean_val: Double, head: Array[Long], wsum: Long)

/** One decoded ANIMATED-GIF frame's stats: GCE delay plus the
  * position-sensitive pixel features (head + Σ v(i)·(i+1)). */
final case class GifFrameFeatures(
    asset_id: Long, frame_idx: Int, delay_cs: Int, n_px: Long,
    mean_val: Double, head: Array[Long], wsum: Long)

/** One ViT-style image patch: flattened row-major RGB values of a
  * `p`×`p` tile at patch-grid position (py, px). */
final case class ImagePatch(
    asset_id: Long, py: Int, px: Int, patch: Array[Long], mean_byte: Double)

/** Output row of the fused resize+decode pass: resized dimensions plus the
  * feature stats of the RESIZED payload. */
final case class ResizedFeatures(
    asset_id: Long, format: String, width: Int, height: Int,
    n_bytes: Long, mean_byte: Double)

/** One SAMPLED video frame's decoded stats: container geometry (frame
  * count, fps) plus the per-frame pixel features a frame-selection /
  * captioning stage filters on. */
final case class VideoFrameFeatures(
    asset_id: Long, frame_idx: Int, n_frames: Int, fps: Double,
    width: Int, height: Int, n_bytes: Long, mean_byte: Double)

/** One ViT-style patch of one SAMPLED video frame (the video-training
  * input unit: sample frames, tile each into patch tokens). */
final case class VideoPatch(
    asset_id: Long, frame_idx: Int, py: Int, px: Int,
    patch: Array[Long], mean_byte: Double)

/** STUB DECODER — deterministic fake. A real deployment would link an image/
  * audio codec (javacpp-ffmpeg, twelvemonkeys, …) and decode `payload` into
  * pixels/samples here; those libraries are not available in this
  * environment, so the "decode" is a deterministic byte-level computation
  * with the same interface, batch shape and cost profile. Everything AROUND
  * this stub — schema, partitioning, per-partition batch iteration — is the
  * real Spark plumbing a production decoder would use unchanged. Formats
  * decodable in pure JVM bytes are NOT stubbed: [[BmpCodec]] (24bpp BMP),
  * [[graft.ops.PngCodec]] (grayscale/truecolor/palette PNG),
  * [[graft.ops.GifCodec]] (GIF89a with the real adaptive LZW),
  * [[graft.ops.WavCodec]] (RIFF/PCM + G.711 µ-law + IMA ADPCM),
  * [[graft.ops.JpegCodec]] (baseline grayscale + YCbCr color JPEG) and
  * [[graft.ops.AviCodec]] (MJPEG/AVI video) all parse the genuine
  * formats; the stub remains only for inter-frame video (H.264-class)
  * and perceptual-audio (MP3/AAC-class) families that genuinely need
  * native codecs. */
object FakeDecoder {
  val HistBuckets = 16

  /** STUB RESIZE — keeps every `stride`-th payload byte and divides the
    * spatial metadata by `stride` (ceiling). A real codec would decode,
    * box-filter, re-encode; the interface (binary in → binary out, metadata
    * transformed alongside) is what the pipeline plumbing exercises. */
  def resize(a: MediaAsset, stride: Int): MediaAsset = {
    val n = (a.payload.length + stride - 1) / stride
    val out = new Array[Byte](math.max(n, 0))
    var i = 0
    while (i < n) { out(i) = a.payload(i * stride); i += 1 }
    a.copy(payload = out,
      width = (a.width + stride - 1) / stride,
      height = (a.height + stride - 1) / stride)
  }

  def decode(a: MediaAsset): MediaFeatures = {
    val hist = new Array[Long](HistBuckets)
    var sum = 0L
    var i = 0
    while (i < a.payload.length) {
      val b = a.payload(i) & 0xff
      hist(b * HistBuckets / 256) += 1
      sum += b
      i += 1
    }
    val mean = if (a.payload.length == 0) 0.0 else sum.toDouble / a.payload.length
    MediaFeatures(a.asset_id, a.format, a.payload.length.toLong, mean, hist)
  }
}

/** REAL BMP codec — pure-JVM byte-level encode/decode of the 24-bit
  * uncompressed BMP layout (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up
  * rows, BGR pixel order, 4-byte row padding — the public file-format
  * layout). This replaces the stub for the one format the sandbox can
  * genuinely decode without native codecs; FakeDecoder remains only for
  * formats that would need ffmpeg/libjpeg-class libraries. */
object BmpCodec {
  private val HeaderSize = 54

  /** Encode row-major TOP-DOWN RGB triplets as a standard 24bpp BMP. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val rowSize = (w * 3 + 3) / 4 * 4
    val imgSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(HeaderSize + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(HeaderSize + imgSize).putInt(0).putInt(HeaderSize)
    buf.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up storage
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        buf.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR on disk
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24bpp uncompressed BMP into (width, height, top-down RGB).
    * Validates magic, bit depth and compression — a malformed payload fails
    * loudly instead of producing garbage stats. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= HeaderSize &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte, "not a BMP payload")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(h > 0 && w > 0, s"unsupported BMP dims ${w}x$h")
    require(buf.getShort(28) == 24, "only 24bpp BMP supported")
    require(buf.getInt(30) == 0, "only uncompressed (BI_RGB) BMP supported")
    val rowSize = (w * 3 + 3) / 4 * 4
    require(payload.length >= dataOffset + rowSize * h, "truncated BMP payload")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (h - 1 - y) * rowSize // stored bottom-up
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = payload(s + 2); rgb(d + 1) = payload(s + 1); rgb(d + 2) = payload(s)
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Feature stats of the DECODED pixels (same output contract as the stub,
    * but n_bytes/mean/hist describe real decoded image bytes). */
  def decodeFeatures(a: MediaAsset): MediaFeatures = {
    val (w, h, rgb) = decode(a.payload)
    val hist = new Array[Long](FakeDecoder.HistBuckets)
    var sum = 0L
    var i = 0
    while (i < rgb.length) {
      val b = rgb(i) & 0xff
      hist(b * FakeDecoder.HistBuckets / 256) += 1
      sum += b
      i += 1
    }
    val mean = if (rgb.length == 0) 0.0 else sum.toDouble / rgb.length
    MediaFeatures(a.asset_id, a.format, rgb.length.toLong, mean, hist)
    // (w, h) intentionally unused beyond decode validation: the features
    // contract reports byte-level stats; dimensions ride the asset metadata
  }

  /** REAL nearest-neighbor resize on the decoded pixel grid: dst(x,y) =
    * src(x·stride, y·stride), dims divided with ceiling — then the stats of
    * the resized pixels (the fused resize+extract pass, for real). */
  def resizeFeatures(a: MediaAsset, stride: Int): ResizedFeatures = {
    val (w, h, rgb) = decode(a.payload)
    val dw = (w + stride - 1) / stride
    val dh = (h + stride - 1) / stride
    var sum = 0L
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        val s = ((y * stride) * w + x * stride) * 3
        sum += (rgb(s) & 0xff) + (rgb(s + 1) & 0xff) + (rgb(s + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = dw.toLong * dh * 3
    ResizedFeatures(a.asset_id, a.format, dw, dh, n,
      if (n == 0) 0.0 else sum.toDouble / n)
  }
}

/** Multimodal column operators. */
object MultimodalOps {

  /** Fan a small single-split scan out to the session parallelism before
    * the per-row ENCODE map (r18; guide §2.5 input-skew stance): the bench
    * documents table is one sub-MB parquet file = ONE input split, so
    * every fixture-encode + decode chain below otherwise fuses into a
    * single task regardless of core count — measured as the dominant wall
    * time of the mm/transport faces at local[32]. The exchange carries
    * (id, text) rows once, before any payload exists; real corpus-scale
    * inputs arrive multi-split and the round-robin is a no-op cost-wise. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Derive a deterministic media-asset table from `documents`: the text
    * bytes play the role of an encoded payload; format and metadata are
    * derived from the id. (The driver testdata has no binary table — this
    * keeps inputs driver-provided while exercising real binary columns.) */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    fanOut(docs).select(
      col("doc_id").as("asset_id"),
      element_at(lit(Array("audio", "image", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("format"),
      col("text").cast("binary").as("payload"),
      ((col("doc_id") % 640) + 1).cast("int").as("width"),
      ((col("doc_id") % 480) + 1).cast("int").as("height"),
      lit(3).cast("int").as("channels"),
      lit(16000).cast("int").as("sample_rate"))

  /** Deterministic REAL-BMP asset table from `documents`: each doc becomes
    * a tiny 24bpp BMP whose RGB bytes are the text's bytes repeated
    * cyclically over a (doc_id-derived) w×h grid — a fixture whose encoded
    * payload is a genuine, parseable BMP file, and whose decoded-pixel
    * stats an oracle can recompute from the text alone. Encoding runs in
    * the same typed per-partition shape as decoding (fixture generation is
    * not a hot operator; the DECODE side is what the queries measure). */
  def bmpAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // ASCII contract enforced LOUDLY: the DuckDB oracle tiles full
        // unicode() codepoints while the pixel bytes are chars truncated
        // to a byte — identical only below 128. A non-ASCII corpus must
        // fail here, not silently diverge from the oracle.
        require(text.forall(_ < 128),
          s"bmp fixture requires ASCII text (doc $id)")
        val w = (id % 8 + 1).toInt
        val h = (id % 6 + 1).toInt
        val rgb = Array.tabulate(w * h * 3)(i =>
          if (text.isEmpty) 0.toByte else text.charAt(i % text.length).toByte)
        MediaAsset(id, "bmp", BmpCodec.encode(w, h, rgb), w, h, 3, 0)
      }.toDF()
  }

  /** Deterministic REAL-WAV asset table from `documents`: each doc becomes
    * a genuine RIFF/WAVE 16-bit PCM mono file whose samples are an affine
    * map of the text's bytes — `s(i) = (byte(i) − 80) · 257` — so the
    * signal swings both signs (zero crossings exist) and an oracle can
    * recompute every stat from the text alone. Sample rate cycles through
    * the common telephony/speech/CD rates by id; every 5th asset carries a
    * JUNK metadata chunk between `fmt ` and `data`, so the decoder's chunk
    * walk (not a fixed 44-byte header assumption) is exercised by the
    * corpus itself. */
  def wavAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // same LOUD ASCII contract as the BMP fixture: the oracle maps
        // unicode() code points, the encoder maps chars — identical only
        // below 128, so a non-ASCII corpus must fail here, not diverge.
        require(text.forall(_ < 128),
          s"wav fixture requires ASCII text (doc $id)")
        val samples = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "wav",
          WavCodec.encode(rate, 1, samples, junkChunk = id % 5 == 0),
          0, 0, 1, rate)
      }.toDF()
  }

  /** Baseline-TIFF asset table ([[graft.ops.TiffCodec]]): per doc one
    * grayscale TIFF of the text-tiled pixels. Every 3rd doc's pixels
    * repeat in 4-runs (the PackBits RLE path); the rest are literal-heavy;
    * every 4th asset is UNCOMPRESSED (compression 1 — both baseline strip
    * paths live in the corpus); every 5th carries an externally-stored
    * Software tag the IFD walk must skip (the TIFF twin of the WAV JUNK
    * chunk). Multi-strip always (rowsPerStrip 4). */
  def tiffAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"tiff fixture requires ASCII text (doc $id)")
        val w = (id % 13 + 1).toInt
        val h = (id % 5 + 2).toInt
        val px = Array.tabulate(w * h) { i =>
          if (text.isEmpty) 0.toByte
          else {
            val k = if (id % 3 == 0) (i / 4) % text.length else i % text.length
            text.charAt(k).toByte
          }
        }
        val comp = if (id % 4 == 0) TiffCodec.CompressionNone
                   else TiffCodec.CompressionPackBits
        MediaAsset(id, "tiff",
          TiffCodec.encode(w, h, px, comp, rowsPerStrip = 4,
            softwareTag = id % 5 == 0), w, h, 1, 0)
      }.toDF()
  }

  /** Position-sensitive decoded-pixel features of TIFF assets — the
    * [[decodeGray16Features]] shape over [[graft.ops.TiffCodec.decode]]
    * (a strip-offset, PackBits-control or IFD-walk bug permutes or shifts
    * bytes and breaks head/wsum even when the mean survives). */
  def tiffPositionalFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, g) = TiffCodec.decode(a.payload)
      val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
      Gray16Features(a.asset_id, a.format, g.length.toLong, mean, head, wsum)
    }
  }

  /** Gzip asset table — documents as they arrive off a crawl: every doc's
    * UTF-8 text gzipped; every 3rd doc as TWO concatenated members (the
    * WARC multi-member shape — a first-member-only reader truncates it,
    * which the value gate catches via n_chars/fingerprint). */
  def gzipAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val payload =
          if (id % 3 == 0 && bytes.length >= 2) {
            val half = bytes.length / 2
            GzipCodec.gzipMembers(Seq(bytes.take(half), bytes.drop(half)))
          } else GzipCodec.gzip(bytes)
        MediaAsset(id, "gz", payload, 0, 0, 1, 0)
      }.toDF()
  }

  /** Decompressed text of gzip assets — the ingestion map pass a crawl
    * pipeline runs before any text operator. One typed map per asset;
    * downstream stats compute in the same stage (no shuffle ever carries
    * the text). */
  def gunzipText(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      (a.asset_id,
        new String(GzipCodec.gunzip(a.payload),
          java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("asset_id", "text")
  }

  /** WARC asset table — documents as Common Crawl actually ships them:
    * per doc one `.warc.gz` holding a warcinfo record, a request record,
    * a 404 response (which a correct reader must STATUS-FILTER out — a
    * pipeline that ingests error pages poisons the corpus) and the
    * HTTP-200 response record(s) carrying the doc text; every 5th doc's
    * text is split across TWO 200-responses (a first-response-only reader
    * truncates it — same trap as the two-member gzip fixture). Every
    * record is its own gzip member (record-at-time compression, the WARC
    * spec's split-friendly layout), so the [[GzipCodec]] multi-member
    * walk is load-bearing underneath. */
  def warcAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val uri = s"http://example.com/doc/$id"
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val info = WarcCodec.record("warcinfo", s"info-$id",
          Seq("Content-Type" -> "application/warc-fields"),
          "software: graft/1.0\r\nformat: WARC File Format 1.0\r\n"
            .getBytes(utf8))
        val req = WarcCodec.record("request", s"req-$id",
          Seq("Content-Type" -> "application/http; msgtype=request",
            "WARC-Target-URI" -> uri),
          s"GET /doc/$id HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(utf8))
        val notFound = WarcCodec.record("response", s"err-$id",
          Seq("Content-Type" -> "application/http; msgtype=response",
            "WARC-Target-URI" -> s"$uri/gone"),
          WarcCodec.httpResponse(404, "Not Found", "text/plain",
            "not found".getBytes(utf8)))
        // split the STRING by CODE POINTS (not its UTF-8 bytes, and not
        // UTF-16 code units): per-part encodings concatenate back to the
        // whole encoding, and the split condition replays in DuckDB as
        // length(text) >= 2 — DuckDB length() counts code points, so the
        // split point is engine-exact even for the normalization plants'
        // non-ASCII text (r15's ASCII guard dropped; r15 verdict task 2)
        val cps = text.codePoints.toArray
        val parts =
          if (id % 5 == 0 && cps.length >= 2) {
            val half = cps.length / 2
            Seq(new String(cps, 0, half), new String(cps, half, cps.length - half))
          } else Seq(text)
        // TRANSPORT-LEVEL charset variety (r16 verdict missing #1): a real
        // crawl is several-percent legacy-charset, so the fixture ships
        // every 4th-±1 doc's body as windows-1252 / Shift_JIS (header-
        // declared) and every 4th-3 as BOM'd UTF-8 — GATED on the exact
        // encode∘decode round-trip, so the transport stays LOSSLESS and
        // every downstream oracle keeps replaying from the markup wrap
        // (a doc the legacy charset can't carry falls back to plain
        // UTF-8). Skipping the sniff in warcTexts mojibakes these bodies
        // and value-breaks the curation gates.
        def roundTrips(c: java.nio.charset.Charset): Boolean =
          c.newEncoder().canEncode(text) &&
            new String(text.getBytes(c), c) == text
        val legacy = (id % 4) match {
          case 1 if roundTrips(CharsetOps.Known("windows-1252")) =>
            Some(("windows-1252", CharsetOps.Known("windows-1252"), false))
          case 2 if roundTrips(CharsetOps.Known("shift_jis")) =>
            Some(("shift_jis", CharsetOps.Known("shift_jis"), false))
          case 3 => Some(("utf-8", utf8, true)) // BOM'd, header undeclared
          case _ => None
        }
        // HTTP WIRE TRANSPORT variety (r17 verdict missing #1): real
        // Common Crawl response records preserve the raw payload, so
        // chunked transfer framing and gzip content coding reach the
        // reader verbatim. id % 7 cycles identity / chunked / gzip /
        // chunked+gzip (coprime with the %4 charset and %5 split plants,
        // so every combination occurs): a reader that skips the dechunk
        // leaks hex size lines into the text (fingerprint break — the
        // 7-byte chunks also split multi-byte sequences, proving dechunk
        // runs BEFORE the charset decode), and one that skips the gunzip
        // feeds gzip bytes to the charset sniff (loud decode throw).
        val (chunked, gzipped) = (id % 7) match {
          case 1 => (true, false)
          case 2 => (false, true)
          case 3 => (true, true)
          case _ => (false, false)
        }
        val oks = parts.zipWithIndex.map { case (part, i) =>
          val (cType, bytes) = legacy match {
            case Some((label, cs, bommed)) =>
              val enc = part.getBytes(cs)
              if (bommed)
                ("text/plain",
                  (if (i == 0) Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
                   else Array.emptyByteArray) ++ enc)
              else (s"text/plain; charset=$label", enc)
            case None => ("text/plain; charset=utf-8", part.getBytes(utf8))
          }
          WarcCodec.record("response", s"resp-$id-$i",
            Seq("Content-Type" -> "application/http; msgtype=response",
              "WARC-Target-URI" -> uri),
            WarcCodec.httpResponseEncoded(200, "OK", cType, bytes,
              chunked = chunked, gzipped = gzipped))
        }
        val payload = GzipCodec.gzipMembers(Seq(info, req, notFound) ++ oks)
        MediaAsset(id, "warc.gz", payload, 0, 0, 1, 0)
      }.toDF()
  }

  /** Crawl-reader map pass over WARC assets: gunzip all members, walk the
    * records, keep `response` records, status-filter to 200, then SNIFF
    * each body's charset (BOM > Content-Type header > meta prescan >
    * UTF-8 default — [[CharsetOps.decodeBody]]) and transcode to UTF-8
    * BEFORE concatenating in record order (multi-part fetches) — the
    * r16-verdict gap: an unconditional UTF-8 read mojibakes the
    * several-percent legacy-charset slice of a real crawl. Undecodable
    * bytes throw loudly (quarantine beats silent replacement chars). One
    * typed map per asset, the text never shuffles. Returns
    * (asset_id, n_records, n_responses, text). */
  def warcTexts(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val recs = WarcCodec.readRecords(GzipCodec.gunzip(a.payload))
      val resp = recs.filter(_.warcType == "response")
      // per-record decode, string concat (the fixture splits multi-part
      // fetches at code points, so each part decodes standalone); linear
      // builder — this is the hot per-asset map path
      val body = new java.lang.StringBuilder()
      resp.iterator
        .filter(r => WarcCodec.httpStatus(r.payload) == 200)
        .foreach { r =>
          val (bytes, cType) = WarcCodec.httpBodyAndContentType(r.payload)
          body.append(CharsetOps.decodeBody(bytes, cType)._2)
        }
      (a.asset_id, recs.length.toLong, resp.length.toLong, body.toString)
    }.toDF("asset_id", "n_records", "n_responses", "text")
  }

  /** Raw-HTTP asset table exercising the full charset-sniff precedence
    * (r16 verdict missing #1) — one HTTP/1.1 response message per doc,
    * five planted declaration shapes by doc_id % 5:
    * 0 = BOM'd UTF-8 (no declaration — the BOM must win),
    * 1 = windows-1252 declared in the Content-Type header,
    * 2 = Shift_JIS declared ONLY in an HTML `<meta charset>` tag (bare
    *     `text/html` header — the prescan must find it),
    * 3 = ISO-8859-1 declared in the header,
    * 4 = undeclared plain ASCII (the UTF-8 default path).
    * Classes 0-3 append charset-distinctive non-ASCII suffixes (é at
    * 0xE9 in cp1252 vs C3 A9 in UTF-8; 日本 at 93FA 967B in Shift_JIS;
    * ¼½ at BC BD in latin-1), so a skipped or mis-ordered sniff stage
    * produces value-visible mojibake, not a silent pass. ASCII source
    * text required (the codec-fixture contract). */
  def httpAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"http charset fixture requires ASCII text (doc $id)")
        val (cType, bytes) = (id % 5) match {
          case 0 =>
            ("text/plain", Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
              (text + " café").getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
          case 1 =>
            ("text/html; charset=windows-1252",
              (text + " café").getBytes(
                CharsetOps.Known("windows-1252")))
          case 2 =>
            ("text/html",
              ("<html><head><meta charset=shift_jis></head><body>" + text +
                " 日本</body></html>").getBytes(
                CharsetOps.Known("shift_jis")))
          case 3 =>
            ("text/plain; charset=iso-8859-1",
              (text + " ¼½").getBytes(
                java.nio.charset.StandardCharsets.ISO_8859_1))
          case _ =>
            ("text/plain", text.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
        }
        MediaAsset(id, "http",
          WarcCodec.httpResponse(200, "OK", cType, bytes), 0, 0, 1, 0)
      }.toDF()
  }

  /** Charset-sniffed decode of raw-HTTP assets: status-check, sniff (BOM
    * > header > meta prescan > UTF-8 default), strict transcode —
    * [[CharsetOps.decodeBody]] as one typed map pass. Returns
    * (asset_id, charset, text); undecodable bytes or unknown declared
    * labels THROW (quarantine, never replacement chars). */
  def httpTexts(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (bytes, cType) = WarcCodec.httpBodyAndContentType(a.payload)
      val (charset, text) = CharsetOps.decodeBody(bytes, cType)
      (a.asset_id, charset, text)
    }.toDF("asset_id", "charset", "text")
  }

  /** WAT asset table — Common Crawl's pre-extracted METADATA sibling of
    * the WARC fixture (r16 verdict missing #6): per doc one `.wat.gz`
    * holding a warcinfo record plus a `metadata` record whose JSON
    * envelope (`Envelope → Payload-Metadata → HTTP-Response-Metadata →
    * HTML-Metadata → Links`) carries the pre-extracted anchor list — the
    * link graph WITHOUT re-parsing markup. Input: (doc_id,
    * dsts ARRAY<LONG>), the same planted ring arithmetic the HTML
    * extraction face embeds as real anchors. */
  def watAssetsFromDocuments(links: DataFrame): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    fanOut(links).select(col("doc_id"), col("dsts")).as[(Long, Seq[Long])]
      .map { case (id, dsts) =>
        val uri = s"http://example.com/doc/$id"
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val info = WarcCodec.record("warcinfo", s"info-$id",
          Seq("Content-Type" -> "application/warc-fields"),
          "software: graft/1.0\r\nformat: WARC File Format 1.0\r\n"
            .getBytes(utf8))
        val linkJson = dsts
          .map(d => s"""{"path": "A@/href", "url": "/doc/$d"}""")
          .mkString("[", ", ", "]")
        val body =
          s"""{"Envelope": {"WARC-Header-Metadata": {"WARC-Target-URI": "$uri"},
             | "Payload-Metadata": {"HTTP-Response-Metadata":
             | {"HTML-Metadata": {"Links": $linkJson}}}}}""".stripMargin
            .replace("\n", "")
        val meta = WarcCodec.record("metadata", s"wat-$id",
          Seq("Content-Type" -> "application/json",
            "WARC-Target-URI" -> uri),
          body.getBytes(utf8))
        MediaAsset(id, "wat.gz",
          GzipCodec.gzipMembers(Seq(info, meta)), 0, 0, 1, 0)
      }.toDF()
  }

  /** Link edges from WAT metadata records: gunzip members, TYPE-FILTER to
    * `metadata`, then let Spark's native JSON machinery take over —
    * `from_json` with an explicit envelope schema (no schema inference
    * pass at 100 TB), explode the Links array, parse the target doc out
    * of the server-relative url. Returns (src, dst) — the edge list the
    * PageRank face consumes, byte-identical to the HTML-extraction
    * face's edges by construction (a drift isolates the WAT parser). */
  def watLinks(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // ONE ROW PER metadata RECORD (review finding: concatenating multiple
    // records' payloads is invalid JSON that a permissive parse would
    // silently null out — real WAT files carry several records per page)
    val raw = assets.as[MediaAsset].flatMap { a =>
      val recs = WarcCodec.readRecords(GzipCodec.gunzip(a.payload))
      val metas = recs.filter(_.warcType == "metadata")
      require(metas.nonEmpty, s"wat: no metadata record in asset ${a.asset_id}")
      metas.map(r => (a.asset_id, new String(r.payload,
        java.nio.charset.StandardCharsets.UTF_8)))
    }.toDF("asset_id", "wat_json")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "Envelope STRUCT<`WARC-Header-Metadata`: STRUCT<`WARC-Target-URI`: STRING>, " +
        "`Payload-Metadata`: STRUCT<`HTTP-Response-Metadata`: " +
        "STRUCT<`HTML-Metadata`: STRUCT<Links: " +
        "ARRAY<STRUCT<path: STRING, url: STRING>>>>>>")
    // FAILFAST: a malformed envelope throws instead of nulling out the
    // asset's whole edge set (the loud-failure contract every reader in
    // this file keeps); non-/doc/ urls are links LEAVING the corpus —
    // dropped explicitly, never as a null dst that would still count in
    // the out-degree
    raw.select(col("asset_id"),
        from_json(col("wat_json"), schema,
          Map("mode" -> "FAILFAST")).as("env"))
      .select(col("asset_id").as("src"),
        explode(col("env.Envelope.`Payload-Metadata`" +
          ".`HTTP-Response-Metadata`.`HTML-Metadata`.Links")).as("l"))
      .select(col("src"),
        regexp_extract(col("l.url"), "/doc/(\\d+)", 1).cast("long").as("dst"))
      .filter(col("dst").isNotNull)
  }

  /** MP4 asset table (ISO-BMFF audit fixture — r16 verdict missing #4):
    * per doc one minimal conforming file whose every audited field is
    * doc_id arithmetic — brand isom/mp42 by %2, movie duration
    * (%240+30)·20 at timescale 600, an avc1 video track of %50+10
    * samples (29.97 fps timescale), an mp4a audio track of %80+20
    * samples on even docs, a planted `free` box every 3rd doc (walked
    * over by size), the 64-bit largesize `mdat` form every 5th doc, and
    * a TWO-entry `stts` table every 7th doc (a first-entry-only reader
    * mis-sums). */
  def mp4AssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id")).as[Long].map { id =>
      val video = Mp4Codec.TrackMeta("vide", "avc1", 30000L, id % 50 + 10)
      val tracks =
        if (id % 2 == 0)
          Seq(video, Mp4Codec.TrackMeta("soun", "mp4a", 48000L, id % 80 + 20))
        else Seq(video)
      val payload = Mp4Codec.encode(
        brand = if (id % 2 == 0) "isom" else "mp42",
        timescale = 600L, duration = (id % 240 + 30) * 20,
        tracks = tracks, mdatBytes = (id % 100 + 8).toInt,
        planFree = id % 3 == 0, largeMdat = id % 5 == 0,
        sttsEntries = if (id % 7 == 0) 2 else 1)
      MediaAsset(id, "mp4", payload, 0, 0, 1, 0)
    }.toDF()
  }

  /** EXIF audit fixture (r16 verdict missing #5): per doc one real
    * baseline JPEG (8×8, constant plane — the audit never decodes pixels)
    * with an APP1 Exif segment planted by doc_id arithmetic: orientation
    * (%8)+1, DateTime day (%28)+1, Make cam-(%5), a GPS IFD every 3rd
    * doc (the PII plant), byte order alternating II/MM (%2 — the
    * TIFF-endian walk must handle both), and every 7th doc with NO Exif
    * at all (the None path). */
  def exifJpegAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id")).as[Long].map { id =>
      val base = JpegCodec.encodeGray(8, 8, new Array[Byte](64))
      val payload =
        if (id % 7 == 0) base
        else ExifCodec.insertApp1(base, ExifCodec.app1(
          orientation = (id % 8 + 1).toInt,
          dateTime = f"2020:01:${id % 28 + 1}%02d 12:00:00",
          make = s"cam-${id % 5}",
          gps = id % 3 == 0,
          bigEndian = id % 2 == 1))
      MediaAsset(id, "jpeg", payload, 8, 8, 1, 0)
    }.toDF()
  }

  /** APP1 Exif audit over JPEG assets ([[ExifCodec.scan]]): orientation /
    * timestamp / make / GPS-presence census plus proof the PII scrub
    * works — `gps_after_strip` re-scans [[ExifCodec.stripExif]]'s output
    * and must come back false everywhere. Metadata-only: entropy-coded
    * image data is never touched. */
  def exifScan(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val meta = ExifCodec.scan(a.payload)
      val stripped = ExifCodec.scan(ExifCodec.stripExif(a.payload))
      (a.asset_id, meta.isDefined,
        meta.map(_.orientation.toLong).getOrElse(0L),
        meta.map(_.dateTime).getOrElse(""),
        meta.map(_.make).getOrElse(""),
        meta.exists(_.hasGps),
        meta.map(_.byteOrder).getOrElse(""),
        stripped.exists(_.hasGps))
    }.toDF("asset_id", "has_exif", "orientation", "datetime", "make",
      "has_gps", "byte_order", "gps_after_strip")
  }

  /** Box-tree audit of MP4 assets ([[Mp4Codec.scan]]): duration, track
    * and codec census, sample counts, mdat extent — all WITHOUT decoding
    * a single media byte (mdat is skipped by size). One typed map per
    * asset. */
  def mp4Scan(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val s = Mp4Codec.scan(a.payload)
      (a.asset_id, s.nTopBoxes, s.brand, s.timescale, s.duration,
        s.duration.toDouble / s.timescale, s.tracks.length.toLong,
        s.tracks.map(_.codec).mkString(","),
        s.tracks.map(_.samples).sum, s.mdatBytes)
    }.toDF("asset_id", "n_boxes", "brand", "timescale", "duration",
      "duration_s", "n_tracks", "codecs", "n_samples", "mdat_bytes")
  }

  /** TAR asset table — the dataset-dump shape (`.tar.gz`): per doc one
    * gzipped ustar archive holding a directory entry (must be walked
    * over, it carries no data), the doc text as `.txt` member(s) — every
    * 4th doc split across TWO `.txt` members whose ENTRY ORDER carries
    * the concatenation — and a `.json` sidecar that a text reader must
    * name-filter out. */
  /** The ustar archive body shared by the .tar.gz and .tar.zst fixtures:
    * directory entry + the text as `.txt` member(s) (every 4th doc split
    * across TWO by code points) + a `.json` sidecar to name-filter out. */
  private def tarArchiveOf(id: Long, text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // code-point split, same engine-exact contract as the WARC fixture
    val cps = text.codePoints.toArray
    val parts =
      if (id % 4 == 0 && cps.length >= 2) {
        val half = cps.length / 2
        Seq(new String(cps, 0, half), new String(cps, half, cps.length - half))
      } else Seq(text)
    val txts = parts.zipWithIndex.map { case (p, i) =>
      TarCodec.entry(s"docs/doc_${id}_$i.txt", '0', p.getBytes(utf8))
    }
    val dir = TarCodec.entry("docs/", '5', Array.emptyByteArray)
    val json = TarCodec.entry(s"docs/meta_$id.json", '0',
      s"""{"id": $id}""".getBytes(utf8))
    TarCodec.archive(Seq(dir) ++ txts ++ Seq(json))
  }

  def tarAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaAsset(id, "tar.gz", GzipCodec.gzip(tarArchiveOf(id, text)),
          0, 0, 1, 0)
      }.toDF()
  }

  /** `.tar.zst` asset table — the SAME archive body as
    * [[tarAssetsFromDocuments]] but shipped through the from-scratch
    * RFC 8878 encoder ([[graft.ops.ZstdCodec]]): one zstd frame with a
    * content checksum per doc (how Dolma-class dumps actually arrive). */
  def tarZstAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaAsset(id, "tar.zst", ZstdCodec.zstd(tarArchiveOf(id, text)),
          0, 0, 1, 0)
      }.toDF()
  }

  /** Dump-reader map pass over `.tar.zst` assets: zstd-decode (checksum
    * verified), then the same ustar walk as [[tarTexts]]. */
  def tarZstTexts(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val entries = TarCodec.readEntries(ZstdCodec.decompress(a.payload))
      val files = entries.filter(_.typeflag == '0')
      val body = new java.io.ByteArrayOutputStream()
      files.iterator.filter(_.name.endsWith(".txt"))
        .foreach(e => body.write(e.data, 0, e.data.length))
      (a.asset_id, entries.length.toLong, files.length.toLong,
        new String(body.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("asset_id", "n_entries", "n_files", "text")
  }

  /** `.zst` text asset table (the .jsonl.zst dump shape, minus the JSONL
    * framing the CSV/JSONL faces already gate): per doc the UTF-8 text as
    * zstd frame(s) from the from-scratch encoder — every 3rd doc as TWO
    * concatenated frames (byte-split: frames concatenate at the byte
    * level, so a first-frame-only reader truncates — the gzip fixture's
    * trap), every 7th doc with a skippable frame planted between them
    * that the reader must walk over. Content checksums everywhere. */
  def zstdAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val frames =
          if (id % 3 == 0 && bytes.length >= 2) {
            val half = bytes.length / 2
            Seq(bytes.take(half), bytes.drop(half))
          } else Seq(bytes)
        val skip =
          if (id % 7 == 0) ZstdCodec.skippableFrame(s"meta $id".getBytes)
          else Array.emptyByteArray
        val payload = ZstdCodec.zstd(frames.head) ++ skip ++
          frames.drop(1).map(ZstdCodec.zstd)
            .foldLeft(Array.emptyByteArray)(_ ++ _)
        MediaAsset(id, "zst", payload, 0, 0, 1, 0)
      }.toDF()
  }

  /** Decompressed text of zstd assets + frame accounting (the fixture
    * pins frame and skippable counts, so a reader that stops at the first
    * frame or chokes on a skippable fails the value gate, not silently). */
  def zstdText(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val d = ZstdCodec.decode(a.payload)
      (a.asset_id, d.nFrames.toLong, d.nSkippable.toLong,
        new String(d.bytes, java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("asset_id", "n_frames", "n_skippable", "text")
  }

  /** Dump-reader map pass over tar assets: gunzip, walk the archive, keep
    * regular `.txt` members and concatenate their data in entry order.
    * Returns (asset_id, n_entries, n_files, text). */
  def tarTexts(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val entries = TarCodec.readEntries(GzipCodec.gunzip(a.payload))
      val files = entries.filter(_.typeflag == '0')
      val body = new java.io.ByteArrayOutputStream() // linear, see warcTexts
      files.iterator.filter(_.name.endsWith(".txt"))
        .foreach(e => body.write(e.data, 0, e.data.length))
      (a.asset_id, entries.length.toLong, files.length.toLong,
        new String(body.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("asset_id", "n_entries", "n_files", "text")
  }

  /** WET asset table — Common Crawl's PRE-EXTRACTED text sibling of the
    * WARC fixture (r15 verdict task 8): per doc one `.wet.gz` holding a
    * warcinfo record, the doc text as `WARC-Type: conversion` record(s)
    * with `text/plain` bodies and NO HTTP framing (the WET difference
    * from WARC response records), and a WAT-style `metadata` record
    * carrying a JSON envelope that a text reader must TYPE-FILTER out
    * (ingesting it poisons the corpus with crawl metadata). Every 6th
    * doc's text splits across TWO conversion records (code-point split,
    * same engine-exact contract as the WARC fixture); every record is its
    * own gzip member (record-at-time compression). */
  def wetAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val uri = s"http://example.com/doc/$id"
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val info = WarcCodec.record("warcinfo", s"info-$id",
          Seq("Content-Type" -> "application/warc-fields"),
          "software: graft/1.0\r\nformat: WARC File Format 1.0\r\n"
            .getBytes(utf8))
        val meta = WarcCodec.record("metadata", s"meta-$id",
          Seq("Content-Type" -> "application/json",
            "WARC-Target-URI" -> uri),
          s"""{"Envelope": {"WARC-Header-Length": "0", "doc": $id}}"""
            .getBytes(utf8))
        val cps = text.codePoints.toArray
        val parts =
          if (id % 6 == 0 && cps.length >= 2) {
            val half = cps.length / 2
            Seq(new String(cps, 0, half), new String(cps, half, cps.length - half))
          } else Seq(text)
        val convs = parts.zipWithIndex.map { case (part, i) =>
          WarcCodec.record("conversion", s"conv-$id-$i",
            Seq("Content-Type" -> "text/plain",
              "WARC-Target-URI" -> uri),
            part.getBytes(utf8))
        }
        val payload = GzipCodec.gzipMembers(Seq(info, meta) ++ convs)
        MediaAsset(id, "wet.gz", payload, 0, 0, 1, 0)
      }.toDF()
  }

  /** WET-reader map pass: gunzip all members, walk the records, keep
    * `conversion` records and concatenate their text/plain bodies in
    * record order — no HTTP parse (WET bodies are the text itself, which
    * is the format's entire point: extraction already happened upstream).
    * Returns (asset_id, n_records, n_conversions, text). */
  def wetTexts(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val recs = WarcCodec.readRecords(GzipCodec.gunzip(a.payload))
      val convs = recs.filter(_.warcType == "conversion")
      convs.foreach { r =>
        require(r.headers.get("content-type").contains("text/plain"),
          s"wet: conversion record in asset ${a.asset_id} is not text/plain")
      }
      val body = new java.io.ByteArrayOutputStream() // linear, see warcTexts
      convs.foreach(r => body.write(r.payload, 0, r.payload.length))
      (a.asset_id, recs.length.toLong, convs.length.toLong,
        new String(body.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("asset_id", "n_records", "n_conversions", "text")
  }

  /** MULTI-PAGE TIFF asset table (the scanned-document shape): per doc one
    * TIFF of 2 + id%3 pages chained through next-IFD pointers, page f
    * tiled from the text at offset 11·f (the GIF-frames tiling). Same
    * compression/tag rotation as [[tiffAssetsFromDocuments]]. */
  def tiffPageAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"tiff fixture requires ASCII text (doc $id)")
        val w = (id % 7 + 2).toInt
        val h = (id % 4 + 2).toInt
        val nf = (2 + id % 3).toInt
        val pages = (0 until nf).map { f =>
          val px = Array.tabulate(w * h)(i =>
            (if (text.isEmpty) 0
             else text.charAt((11 * f + i) % text.length).toInt).toByte)
          (w, h, px)
        }
        val comp = if (id % 4 == 0) TiffCodec.CompressionNone
                   else TiffCodec.CompressionPackBits
        MediaAsset(id, "tiff",
          TiffCodec.encodePages(pages, comp, rowsPerStrip = 4,
            softwareTag = id % 5 == 0), w, h, 1, 0)
      }.toDF()
  }

  /** Per-page positional features of multi-page TIFFs — one row per IFD in
    * chain order; a chain-walk bug (wrong next pointer, page skipped,
    * strip data crossing pages) lands in page_idx/head/wsum directly. */
  def tiffPageFeatures(assets: DataFrame)
      : org.apache.spark.sql.Dataset[TiffPageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].flatMap { a =>
      TiffCodec.decodePages(a.payload).zipWithIndex.map { case ((_, _, g), pi) =>
        val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
        TiffPageFeatures(a.asset_id, pi, g.length.toLong, mean, head, wsum)
      }
    }
  }

  /** FLAC twin of [[wavAssetsFromDocuments]]: the SAME text→sample map and
    * rate rotation, losslessly compressed ([[graft.ops.FlacCodec]]) — so
    * the decoded signal stats are bit-identical to the WAV face and the
    * oracle replays them from the text alone. Every 5th asset carries a
    * PADDING metadata block (the metadata-walk trap, twin of the WAV JUNK
    * chunk). */
  def flacAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"flac fixture requires ASCII text (doc $id)")
        val samples = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "flac",
          FlacCodec.encode(rate, samples, paddingBlock = id % 5 == 0),
          0, 0, 1, rate)
      }.toDF()
  }

  /** STEREO FLAC asset table: L is the standard text→sample map, R the
    * same map shifted 3 chars — correlated channels, so the cycling
    * decorrelation modes (independent / left-side / side-right / mid-side,
    * one per frame at blockSize 64) genuinely compress. Lossless ⇒ the
    * oracle replays interleaved stats from the text alone. */
  def flacStereoAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"flac fixture requires ASCII text (doc $id)")
        val n = text.length
        val inter = new Array[Short](2 * n)
        var i = 0
        while (i < n) {
          inter(2 * i) = ((text.charAt(i) - 80) * 257).toShort
          inter(2 * i + 1) = ((text.charAt((i + 3) % n) - 80) * 257).toShort
          i += 1
        }
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "flac",
          FlacCodec.encodeStereo(rate, inter, blockSize = 64,
            paddingBlock = id % 5 == 0),
          0, 0, 2, rate)
      }.toDF()
  }

  /** LPC-FLAC asset table: the same signal/rate map as
    * [[flacAssetsFromDocuments]] but encoded through SUBFRAME_LPC
    * ([[graft.ops.FlacCodec.encodeLpc]] — Levinson-Durbin coefficients
    * quantized to 12 bits, order cycling 1..8 by frame, blockSize 64 so
    * every doc spans several orders). Lossless ⇒ the oracle replays the
    * identical stats from the text; a slip anywhere in the LPC chain
    * (coefficient read width, shift sign, 64-bit accumulator, warm-up)
    * lands in rms/peak/zero-crossings exactly. */
  def flacLpcAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"flac fixture requires ASCII text (doc $id)")
        val samples = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "flac",
          FlacCodec.encodeLpc(rate, samples, blockSize = 64,
            paddingBlock = id % 5 == 0),
          0, 0, 1, rate)
      }.toDF()
  }

  /** AIFF asset table: the same signal/rate map as the WAV/FLAC twins in
    * the big-endian IFF container ([[graft.ops.AiffCodec]]) — every 5th
    * asset carries an odd-size ANNO chunk (the IFF even-padding trap,
    * this family's JUNK/PADDING sibling). Identical decoded stats to the
    * other audio faces, replayed from the text alone. */
  def aiffAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"aiff fixture requires ASCII text (doc $id)")
        val samples = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "aiff",
          AiffCodec.encode(rate, 1, samples, annoChunk = id % 5 == 0),
          0, 0, 1, rate)
      }.toDF()
  }

  /** MP3 asset table for the HEADER-WALK audit face: constant-bitrate
    * MPEG-1 Layer III frame sequences (bitrate/rate/frame-count/padding
    * all doc_id-derived), every 3rd asset behind an ID3v2.3 prefix with a
    * synchsafe size. Payload bytes are deterministic filler — the walk
    * never reads them (that is the point: audits measure without
    * decoding). */
  def mp3AssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kbpss = Array(64, 96, 128, 192, 320)
    fanOut(docs).select(col("doc_id")).as[Long]
      .map { id =>
        val kbps = kbpss((id % 5).toInt)
        val rate = Mp3Codec.SampleRates((id % 3).toInt)
        val nFrames = (5 + id % 7).toInt
        val id3 = if (id % 3 == 0) (17 + id % 9).toInt else 0
        MediaAsset(id, "mp3",
          Mp3Codec.encode(kbps, rate, nFrames,
            f => if ((id + f) % 3 == 0) 1 else 0, id3),
          0, 0, 1, rate)
      }.toDF()
  }

  /** Header-walk scan of MP3 assets — one typed map, payload bytes never
    * shuffle. Returns the corpus-audit columns (frame count, bitrate,
    * rate, sample count, duration, section sizes). */
  def mp3Scan(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (nf, kbps, rate, frameBytes, id3Bytes) = Mp3Codec.scan(a.payload)
      val nSamples = nf.toLong * Mp3Codec.SamplesPerFrame
      (a.asset_id, nf.toLong, kbps, rate, nSamples,
        nSamples.toDouble / rate, frameBytes, id3Bytes)
    }.toDF("asset_id", "n_frames", "bitrate_kbps", "sample_rate",
      "n_samples", "duration_s", "frame_bytes", "id3_bytes")
  }

  /** Netpbm asset table: even ids P5 grayscale, odd ids P6 RGB; every
    * 3rd asset 16-BIT (samples c·257, maxval 65535 — both bytes carry
    * signal), every 4th carries a `#` header comment (the header-walk
    * trap). Uncompressed ⇒ the oracle replays decoded samples from the
    * text tiling alone. */
  def pnmAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"pnm fixture requires ASCII text (doc $id)")
        val w = (id % 9 + 1).toInt
        val h = (id % 7 + 1).toInt
        val ch = if (id % 2 == 1) 3 else 1
        val wide = id % 3 == 0
        def c(k: Int): Int =
          if (text.isEmpty) 0 else text.charAt(k % text.length).toInt
        val vs = Array.tabulate(w * h * ch)(i =>
          if (wide) c(i) * 257 else c(i))
        val payload =
          if (ch == 3) PnmCodec.encodeRgb(w, h, if (wide) 65535 else 255, vs,
            comment = id % 4 == 0)
          else PnmCodec.encodeGray(w, h, if (wide) 65535 else 255, vs,
            comment = id % 4 == 0)
        MediaAsset(id, "pnm", payload, w, h, ch, 0)
      }.toDF()
  }

  /** Position-sensitive decoded-sample features of netpbm assets — the
    * [[Gray16Features]] shape over [[graft.ops.PnmCodec.decode]]. */
  def pnmPositionalFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, _, _, vs) = PnmCodec.decode(a.payload)
      val (mean, head, wsum) = positionalStats(vs.length, i => vs(i).toLong)
      Gray16Features(a.asset_id, a.format, vs.length.toLong, mean, head, wsum)
    }
  }

  /** CSV asset table (RFC 4180): per doc one file with an
    * `id,title,body,note` header and the doc text as the `body` field —
    * every 3rd doc's body carries an embedded comma + doubled-quote
    * escape, every 4th an embedded NEWLINE (the shapes that shear a
    * naive line-splitter), every 5th doc a second data row. */
  def csvAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128), // oracle length() counts codepoints
          s"csv fixture requires ASCII text (doc $id)")
        val body = text +
          (if (id % 3 == 0) ", \"q\" x" else "") +
          (if (id % 4 == 0) "\nsecond line" else "")
        val rows = Seq(
          Seq("id", "title", "body", "note"),
          Seq(id.toString, s"Doc $id", body, "n1")) ++
          (if (id % 5 == 0) Seq(Seq(id.toString, "t2", "short", "r2"))
           else Seq.empty)
        MediaAsset(id, "csv",
          CsvCodec.write(rows)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          0, 0, 1, 0)
      }.toDF()
  }

  /** CSV-reader map pass: strict RFC 4180 parse, header check, uniform
    * width enforced by the parser, first data row's `body` recovered.
    * Returns (asset_id, n_rows, n_fields, text). */
  def csvTexts(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val rows = CsvCodec.parse(new String(a.payload,
        java.nio.charset.StandardCharsets.UTF_8))
      require(rows.nonEmpty && rows.head == Seq("id", "title", "body", "note"),
        s"csv: unexpected header in asset ${a.asset_id}")
      require(rows.length >= 2, s"csv: no data rows in asset ${a.asset_id}")
      (a.asset_id, (rows.length - 1).toLong, rows.head.length.toLong,
        rows(1)(2))
    }.toDF("asset_id", "n_rows", "n_fields", "text")
  }

  /** UNLABELED mixed-format corpus — what a crawled blob store actually
    * looks like (no extension, no content-type): per doc ONE asset whose
    * real encoding rotates through all ELEVEN pure-JVM codec families by
    * id % 11 (incl. WebP-VP8L), with the stored format deliberately `bin`. Geometry/signal
    * arithmetic matches each family's own fixture, so the sniffer's
    * decoded unit counts replay in the oracle. */
  def mixedAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"mixed fixture requires ASCII text (doc $id)")
        def c(k: Int): Int =
          if (text.isEmpty) 0 else text.charAt(k % text.length).toInt
        val samples = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val payload = (id % 11).toInt match {
          case 0 =>
            val (w, h) = ((id % 9 + 1).toInt, (id % 7 + 1).toInt)
            PngCodec.encode(w, h,
              Array.tabulate(w * h)(i => c(i).toByte), (id % 5).toInt)
          case 1 =>
            val (w, h) = ((id % 11 + 1).toInt, (id % 6 + 1).toInt)
            GifCodec.encode(w, h, Array.tabulate(w * h)(i => c(i).toByte))
          case 2 =>
            val (w, h) = ((id % 8 + 1).toInt, (id % 6 + 1).toInt)
            BmpCodec.encode(w, h, Array.tabulate(w * h * 3)(i => c(i).toByte))
          case 3 => WavCodec.encode(rates((id % 3).toInt), 1, samples)
          case 4 => FlacCodec.encode(rates((id % 3).toInt), samples)
          case 5 =>
            val (w, h) = ((id % 13 + 1).toInt, (id % 5 + 2).toInt)
            TiffCodec.encode(w, h, Array.tabulate(w * h)(i => c(i).toByte),
              TiffCodec.CompressionPackBits, rowsPerStrip = 4)
          case 6 =>
            val (w, h) = ((8 * (id % 3 + 1)).toInt, (8 * (id % 2 + 1)).toInt)
            JpegCodec.encodeGray(w, h, Array.tabulate(w * h)(i => c(i).toByte))
          case 7 =>
            val (w, h) = ((id % 9 + 1).toInt, (id % 7 + 1).toInt)
            val ch = if (id % 2 == 1) 3 else 1
            val wide = id % 3 == 0
            val vs = Array.tabulate(w * h * ch)(i =>
              if (wide) c(i) * 257 else c(i))
            if (ch == 3) PnmCodec.encodeRgb(w, h, if (wide) 65535 else 255, vs)
            else PnmCodec.encodeGray(w, h, if (wide) 65535 else 255, vs)
          case 8 => AiffCodec.encode(rates((id % 3).toInt), 1, samples)
          case 9 => GzipCodec.gzip(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case _ =>
            val (w, h) = ((id % 10 + 2).toInt, (id % 6 + 2).toInt)
            WebpCodec.encode(w, h,
              Array.tabulate(w * h)(i => (0xff << 24) | (c(i) << 8)),
              subtractGreen = id % 2 == 0,
              cacheBits = if (id % 3 == 0) 0 else 6)
        }
        MediaAsset(id, "bin", payload, 0, 0, 1, 0)
      }.toDF()
  }

  /** WebP-VP8L asset table (r16 verdict missing #2 — the modern web's
    * second image format): per doc one lossless RIFF/WEBP whose ARGB
    * pixels derive from the text (a = 255, g = char, r = char + 64,
    * b = 2·char — three distinct channel laws, so a channel swap or a
    * transform slip is value-visible), with the encoder legs rotating:
    * subtract-green on even docs, color cache (6 bits) except every 3rd
    * doc — runs, cache hits and literals all occur on any repetitive
    * text. */
  def webpAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"webp fixture requires ASCII text (doc $id)")
        val w = (id % 14 + 4).toInt
        val h = (id % 9 + 4).toInt
        def c(k: Int): Int =
          if (text.isEmpty) 0 else text.charAt(k % text.length).toInt
        val argb = Array.tabulate(w * h) { i =>
          (0xff << 24) | ((c(i) + 64) << 16) | (c(i) << 8) | (2 * c(i))
        }
        MediaAsset(id, "webp",
          WebpCodec.encode(w, h, argb,
            subtractGreen = id % 2 == 0,
            cacheBits = if (id % 3 == 0) 0 else 6), w, h, 1, 0)
      }.toDF()
  }

  /** Decode WebP assets to position-sensitive per-channel stats (the
    * mm_decode_png contract): n_px, green sum AND position-weighted
    * green sum, red/blue sums — one typed map, pixels never shuffle. */
  def webpFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (w, h, px) = WebpCodec.decode(a.payload)
      var sg = 0L; var wg = 0L; var sr = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        val g = (px(i) >> 8) & 0xff
        sg += g
        wg += (i + 1).toLong * g
        sr += (px(i) >> 16) & 0xff
        sb += px(i) & 0xff
        i += 1
      }
      (a.asset_id, w.toLong, h.toLong, px.length.toLong, sg, wg, sr, sb)
    }.toDF("asset_id", "w", "h", "n_px", "sum_g", "wsum_g", "sum_r", "sum_b")
  }

  /** Magic-byte sniff: identify the container from the first bytes alone
    * (unrecognized magic throws — a blob store reader that guesses
    * formats corrupts downstream decode). */
  def sniff(p: Array[Byte]): String = {
    def at(i: Int) = if (i < p.length) p(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'E' && at(10) == 'B' && at(11) == 'P') "webp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(0) == 'f' && at(1) == 'L' && at(2) == 'a' && at(3) == 'C') "flac"
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 42 && at(3) == 0) ||
      (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 42)) "tiff"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 'P' && (at(1) == '5' || at(1) == '6')) "pnm"
    else if (at(0) == 'F' && at(1) == 'O' && at(2) == 'R' && at(3) == 'M' &&
      at(8) == 'A' && at(9) == 'I' && at(10) == 'F' && at(11) == 'F') "aiff"
    else if (at(0) == 0x1f && at(1) == 0x8b) "gz"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else throw new IllegalArgumentException(
      s"sniff: unrecognized payload magic ${at(0)} ${at(1)}")
  }

  /** Sniff + DISPATCH: detect each unlabeled asset's container and run
    * the matching real decoder, returning the modality kind and decoded
    * unit count (pixels·channels / samples / decompressed bytes) — one
    * typed map, the blob never shuffles. */
  def sniffDecode(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val fmt = sniff(a.payload)
      val (kind, nUnits) = fmt match {
        case "png"  => ("image", PngCodec.decode(a.payload)._3.length.toLong)
        case "gif"  => ("image", GifCodec.decode(a.payload)._3.length.toLong)
        case "bmp"  => ("image", BmpCodec.decode(a.payload)._3.length.toLong)
        case "tiff" => ("image", TiffCodec.decode(a.payload)._3.length.toLong)
        case "jpeg" => ("image", JpegCodec.decodeGray(a.payload)._3.length.toLong)
        case "pnm"  => ("image", PnmCodec.decode(a.payload)._5.length.toLong)
        case "webp" => ("image", WebpCodec.decode(a.payload)._3.length.toLong)
        case "wav"  => ("audio", WavCodec.decode(a.payload)._3.length.toLong)
        case "flac" => ("audio", FlacCodec.decode(a.payload)._3.length.toLong)
        case "aiff" => ("audio", AiffCodec.decode(a.payload)._3.length.toLong)
        case "gz"   => ("archive", GzipCodec.gunzip(a.payload).length.toLong)
      }
      (a.asset_id, fmt, kind, nUnits)
    }.toDF("asset_id", "detected", "kind", "n_units")
  }

  /** HISTOGRAM EQUALIZATION (the classic contrast augmentation): per
    * image, the integer CDF remap `out = (cdf(v) − cdf_min)·255 / (n −
    * cdf_min)` (floor division; constant images map to 0 — the n =
    * cdf_min branch). Decode + 256-bin histogram + remap run in ONE typed
    * map over the real PNG chain; position-sensitive stats of the
    * equalized pixels gate the value. */
  def histEqualizeFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, g) = PngCodec.decode(a.payload)
      val n = g.length
      val hist = new Array[Int](256)
      g.foreach(b => hist(b & 0xff) += 1)
      val cdf = new Array[Int](256)
      var acc = 0
      var v = 0
      while (v < 256) { acc += hist(v); cdf(v) = acc; v += 1 }
      val cdfMin = if (n == 0) 0 else {
        var m = 0
        while (hist(m) == 0) m += 1
        cdf(m)
      }
      val denom = n - cdfMin
      val eq = Array.tabulate(n) { i =>
        val px = g(i) & 0xff
        // Long multiply: (cdf - cdfMin) * 255 wraps Int past ~8.4M pixels
        if (denom == 0) 0
        else ((cdf(px) - cdfMin).toLong * 255 / denom).toInt
      }
      val (mean, head, wsum) = positionalStats(n, i => eq(i).toLong)
      Gray16Features(a.asset_id, a.format, n.toLong, mean, head, wsum)
    }
  }

  /** Companion-asset id offset of [[blurCompanionAssets]]. */
  val BlurCompanionOffset = 1000000L

  /** Per-replica `doc_id` stride of the scaled-corpus generator
    * ([[graft.tools.GenScale]] consumes this constant): derived-id fixtures
    * that CLASSIFY rows by an id offset (blur companions, brightness
    * twins) must compare MODULO this stride, or every replica original
    * would be mistaken for a companion. Lives here with the other
    * fixture-id-space constants — query semantics must not depend on a
    * tools/ definition. */
  val DocIdStride = 1000000000L

  /** BLUR-PLANTED companion corpus for the blur-detection face: every
    * grayscale-PNG asset additionally yields a horizontally BOX-BLURRED
    * twin (id + [[BlurCompanionOffset]]) — pixel (y, x) becomes the
    * truncating mean of its edge-clamped 3-tap row neighborhood,
    * re-encoded through the real PNG encoder so the codec round-trip
    * stays load-bearing. A 1-wide image blurs to itself ((3p)/3 = p),
    * which the oracle's clamp arithmetic reproduces. */
  def blurCompanionAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val companions = assets.as[MediaAsset].map { a =>
      val (w, h, g) = PngCodec.decode(a.payload)
      val q = Array.tabulate(w * h) { i =>
        val y = i / w
        val x = i % w
        val l = g(y * w + math.max(x - 1, 0)) & 0xff
        val c = g(i) & 0xff
        val r = g(y * w + math.min(x + 1, w - 1)) & 0xff
        ((l + c + r) / 3).toByte
      }
      MediaAsset(a.asset_id + BlurCompanionOffset, "png",
        PngCodec.encode(w, h, q, (a.asset_id % 5).toInt), w, h, 1, 0)
    }
    assets.unionByName(companions.toDF())
  }

  /** BLUR DETECTION — variance of the 4-neighbor Laplacian, the standard
    * vision-corpus sharpness filter (a blurred image has small
    * second-derivative energy). One typed map per asset: decode, fold
    * L(y,x) = 4·p − up − down − left − right over INTERIOR pixels, carry
    * the exact integer moments (Σ L, Σ L²); the variance is one double
    * division of the integer numerator n·ΣL² − (ΣL)² at the very end, so
    * the oracle replays it bitwise. Images with no interior (w < 3 or
    * h < 3 — the fixture includes them) report n_int = 0 and a NULL
    * sharpness rather than a fake 0 score. */
  def lapSharpness(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (w, h, g) = PngCodec.decode(a.payload)
      val (n, s1, s2) = lapMoments(w, h, g)
      val sharp: Option[Double] =
        if (n == 0) None else Some((n * s2 - s1 * s1).toDouble / (n * n))
      (a.asset_id, n, s1, s2, sharp)
    }.toDF("asset_id", "n_int", "lap_sum", "lap_sum2", "sharpness")
  }

  /** Exact integer moments (n, Σ L, Σ L²) of the 4-neighbor Laplacian over
    * interior pixels — ONE definition shared by [[lapSharpness]] and
    * [[imageCurationMoments]] (their oracles must agree bitwise on the
    * numerator n·ΣL² − (ΣL)²). */
  private def lapMoments(w: Int, h: Int, g: Array[Byte]): (Long, Long, Long) = {
    var n = 0L
    var s1 = 0L
    var s2 = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val i = y * w + x
        val l = 4L * (g(i) & 0xff) - (g(i - w) & 0xff) - (g(i + w) & 0xff) -
          (g(i - 1) & 0xff) - (g(i + 1) & 0xff)
        n += 1; s1 += l; s2 += l * l
        x += 1
      }
      y += 1
    }
    (n, s1, s2)
  }

  /** Per-asset moments for the composite image-curation filter: geometry,
    * exact brightness sum, and the Laplacian moments of [[lapSharpness]] —
    * one typed decode pass; every downstream rule is an integer compare
    * (brightness bounds as `sum ≷ k·n`, sharpness as
    * `n·ΣL² − (ΣL)² ≥ T·n²`), so the whole verdict chain replays exactly. */
  def imageCurationMoments(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (w, h, g) = PngCodec.decode(a.payload)
      var bright = 0L
      var i = 0
      while (i < g.length) { bright += (g(i) & 0xff); i += 1 }
      val (n, s1, s2) = lapMoments(w, h, g)
      (a.asset_id, w, h, (w * h).toLong, bright, n, n * s2 - s1 * s1)
    }.toDF("asset_id", "w", "h", "n_px", "bright_sum", "n_int", "lap_num")
  }

  /** Companion-asset id offset and planting step of
    * [[fpWavAssetsFromDocuments]]. */
  val AudioCompanionOffset = 30000000L
  val AudioCompanionStep = 9L

  /** CORPUS-COMMON fingerprint planting for [[fpWavAssetsFromDocuments]]:
    * every [[AudioSilenceStep]]-th doc's clip (and its polarity companion,
    * coinciding at lcm(5,9) = 45) opens with [[AudioSilenceFrames]] frames
    * of digital silence. A zero frame has all band powers 0 → difference
    * byte 0; the all-silence 4-frame window hashes to fp = 0 — ONE
    * fingerprint value planted across ~n/5 of the corpus, exactly the
    * silence-window skew head [[graft.ops.DedupOps
    * .hashSetContainmentPairs]]'s `maxDocFreq` cap exists to drop. (The 3
    * silence→content transition windows are text-dependent, hence
    * doc-specific — only the pure-silence window goes corpus-common.) */
  val AudioSilenceStep = 5L
  val AudioSilenceFrames = 4

  /** Audio-fingerprint frame geometry: 32-sample analysis frames, DFT
    * bands k = 1..9 (9 powers → 8 difference bits per frame — the
    * Haitsma-Kalker band-energy-difference shape), fingerprints hash a
    * 4-frame window. */
  val AudioFpFrame = 32
  val AudioFpBands = 9
  val AudioFpWindow = 4

  /** Fixed-point DFT basis for the audio fingerprint, same 2^10 scale as
    * [[PhashDct]]: Cos(k)(n) = round(cos(2π(k+1)n/32)·1024) for bands
    * k+1 = 1..9. All downstream arithmetic is exact int64, so the DuckDB
    * oracle (interpolating these constants as literals) agrees bitwise. */
  val AudioFpCos: Array[Array[Long]] = Array.tabulate(AudioFpBands, AudioFpFrame)(
    (k, n) => Math.round(Math.cos(2 * Math.PI * (k + 1) * n / AudioFpFrame) * 1024))
  val AudioFpSin: Array[Array[Long]] = Array.tabulate(AudioFpBands, AudioFpFrame)(
    (k, n) => Math.round(Math.sin(2 * Math.PI * (k + 1) * n / AudioFpFrame) * 1024))

  /** PCM WAV asset table for AUDIO fingerprint dedup: every doc becomes
    * the same 16-bit PCM WAV as [[wavAssetsFromDocuments]]; every
    * [[AudioCompanionStep]]-th doc ADDITIONALLY yields a POLARITY-INVERTED
    * companion (id + [[AudioCompanionOffset]], every sample negated — the
    * inaudible inversion re-encoded rips commonly carry). Band POWERS are
    * exactly invariant under negation (|−X|² = |X|²), so companion
    * fingerprints are identical and the planted pairs surface at overlap
    * 1.0 — replayable by the oracle from the text alone.
    *
    * Every [[AudioSilenceStep]]-th doc's clip (and its companion — the
    * inverted rip keeps the leading silence; −0 = 0) opens with
    * [[AudioSilenceFrames]] frames of digital silence, planting the
    * corpus-common fp = 0 window the containment join's `maxDocFreq` cap
    * must drop. Planted-pair overlap stays 1.0 under the cap (both sets
    * lose the same element); without it, `shared`/`np` for
    * silence-planted pairs differ value-visibly from the cap-modeling
    * oracle. */
  def fpWavAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        require(text.forall(_ < 128),
          s"audio fp fixture requires ASCII text (doc $id)")
        val lead =
          if (id % AudioSilenceStep == 0) AudioSilenceFrames * AudioFpFrame
          else 0
        def wav(sgn: Int) = WavCodec.encode(rates((id % 3).toInt), 1,
          Array.tabulate(lead + text.length)(i =>
            if (i < lead) 0.toShort
            else (sgn * (text.charAt(i - lead) - 80) * 257).toShort),
          junkChunk = id % 5 == 0)
        val base = MediaAsset(id, "wav", wav(1), 0, 0, 1, rates((id % 3).toInt))
        if (id % AudioCompanionStep == 0)
          Seq(base, MediaAsset(id + AudioCompanionOffset, "wav", wav(-1),
            0, 0, 1, rates((id % 3).toInt)))
        else Seq(base)
      }.toDF()
  }

  /** SAMPLE-RATE CONVERSION — the 16 kHz normalization every speech/audio
    * training pipeline runs before featurization: integer-exact LINEAR
    * interpolation from each container's native rate to `outRate`. Output
    * sample k sits at source position k·rIn/rOut; with i = (k·rIn)/rOut
    * and num = (k·rIn) mod rOut,
    *   out(k) = s(i)                                   when num = 0
    *          = s(i) + ((s(i+1) − s(i)) · num) / rOut  otherwise
    * (truncating division, exactly DuckDB's `//`), and
    * n_out = (n−1)·rOut/rIn + 1 so the last tap never reads past the
    * signal. Upsampling (8 kHz →), identity (16 kHz) and downsampling
    * (44.1 kHz →) all occur in the fixture corpus. One typed map pass:
    * payloads never leave the task, only the stats rows do. */
  def audioResampleFeatures(assets: DataFrame, outRate: Int)
      : org.apache.spark.sql.Dataset[AudioResampleFeatures] = {
    require(outRate > 0, "output rate must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      require(a.format == "wav", s"audioResampleFeatures needs wav, got ${a.format}")
      val (rateIn, channels, ss) = WavCodec.decode(a.payload)
      require(channels == 1, s"audioResampleFeatures expects mono, got $channels")
      // empty-signal contract: a 0-sample clip resamples to 0 samples
      // (mean 0.0) — matching the oracle's CASE, not a mid-query abort
      val nOut =
        if (ss.isEmpty) 0
        else ((ss.length - 1).toLong * outRate / rateIn + 1).toInt
      var sum = 0L
      var wsum = 0L
      val head = new Array[Long](math.min(12, nOut))
      var k = 0
      while (k < nOut) {
        val pos = k.toLong * rateIn
        val i = (pos / outRate).toInt
        val num = pos % outRate
        val v =
          if (num == 0L) ss(i).toLong
          else ss(i) + (ss(i + 1) - ss(i)).toLong * num / outRate
        sum += v
        wsum += v * (k + 1)
        if (k < head.length) head(k) = v
        k += 1
      }
      AudioResampleFeatures(a.asset_id, rateIn, outRate, ss.length.toLong,
        nOut.toLong, if (nOut == 0) 0.0 else sum.toDouble / nOut, head, wsum)
    }
  }

  /** AUDIO FINGERPRINTS (Haitsma-Kalker 2002 shape, integer-exact): decode
    * PCM, frame into [[AudioFpFrame]]-sample windows (complete frames
    * only), per frame compute band powers E_k = Re² + Im² at the
    * fixed-point DFT bands, emit one bit per adjacent-band energy
    * difference (E_k > E_{k+1} — amplitude-scale-robust, polarity-exact),
    * then hash each [[AudioFpWindow]]-frame byte window with the repo's
    * polynomial (B2/P). One typed map pass: payloads never leave the
    * task, 20 bytes per fingerprint come out. Output
    * (asset_id, frame_idx, fp). */
  /** Fixed-point DFT band powers of frame `f` of sample stream `ss`:
    * E_k = Re² + Im² over the [[AudioFpCos]]/[[AudioFpSin]] integer trig
    * tables — exact int64 (|s| ≤ 2^14, ×1024 ×32 → |Re| ≤ 2^29, E ≤
    * 2^59). Shared by the fingerprint and mel-filterbank faces. */
  def bandEnergiesOf(ss: Array[Short], f: Int): Array[Long] = {
    val e = new Array[Long](AudioFpBands)
    var k = 0
    while (k < AudioFpBands) {
      var re = 0L; var im = 0L
      var n = 0
      while (n < AudioFpFrame) {
        val s = ss(f * AudioFpFrame + n).toLong
        re += s * AudioFpCos(k)(n)
        im += s * AudioFpSin(k)(n)
        n += 1
      }
      e(k) = re * re + im * im
      k += 1
    }
    e
  }

  /** Mel filterbank size and integer weight table — the speech-curation
    * frame features (r15 verdict gap #5). The published mel construction
    * (triangular filters equally spaced on the mel axis,
    * m(f) = 2595·log₁₀(1+f/700), here over the [[AudioFpBands]] DFT bins
    * at a nominal 16 kHz) is evaluated ONCE at build time and quantized
    * to integer weights ×64 — so the per-frame energies are pure int64
    * folds both engines replay exactly. Band powers are pre-scaled by
    * >> [[MelShift]] before weighting: E ≤ 2^59, shifted ≤ 2^39, ×64
    * weight ×9 bands ≤ 2^51 — no overflow even summed over every frame of
    * a clip. */
  val MelBins = 4
  val MelShift = 20
  val MelWeights: Array[Array[Long]] = {
    val fs = 16000.0
    def mel(f: Double) = 2595.0 * math.log10(1 + f / 700.0)
    val fk = (1 to AudioFpBands).map(k => k * fs / AudioFpFrame)
    val lo = mel(fk.head); val hi = mel(fk.last)
    val pts = (0 to MelBins + 1).map(i => lo + (hi - lo) * i / (MelBins + 1))
    Array.tabulate(MelBins, AudioFpBands) { (m, k) =>
      val fm = mel(fk(k))
      val l = pts(m); val c = pts(m + 1); val r = pts(m + 2)
      val w =
        if (fm <= l || fm >= r) 0.0
        else if (fm <= c) (fm - l) / (c - l)
        else (r - fm) / (r - c)
      Math.round(w * 64)
    }
  }

  /** Per-frame mel-filterbank energies over PCM WAV assets: decode, frame
    * into [[AudioFpFrame]] windows, band powers ([[bandEnergiesOf]]),
    * integer mel fold, plus the 1-based argmax bin (strict `>` — ties go
    * to the LOWEST bin, the deterministic rule the oracle replays). One
    * typed map pass; payloads never leave the task. */
  /** Integer mel energies of frame `f`: prescaled band powers folded
    * through [[MelWeights]]. Shared by [[audioMel]] and [[audioMfcc]]. */
  def melEnergiesOf(ss: Array[Short], f: Int): Array[Long] = {
    val e = bandEnergiesOf(ss, f)
    Array.tabulate(MelBins) { m =>
      var acc = 0L
      var k = 0
      while (k < AudioFpBands) {
        acc += MelWeights(m)(k) * (e(k) >> MelShift)
        k += 1
      }
      acc
    }
  }

  def audioMel(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        require(a.format == "wav", s"audioMel needs wav, got ${a.format}")
        val (_, channels, ss) = WavCodec.decode(a.payload)
        require(channels == 1, s"audioMel expects mono, got $channels")
        val nF = ss.length / AudioFpFrame
        (0 until nF).map { f =>
          val melE = melEnergiesOf(ss, f)
          var top = 0
          var m = 1
          while (m < MelBins) { if (melE(m) > melE(top)) top = m; m += 1 }
          (a.asset_id, f, melE(0), melE(1), melE(2), melE(3), (top + 1).toLong)
        }
      }
      .toDF("asset_id", "f", "m0", "m1", "m2", "m3", "top")
  }

  /** Fixed-point log₂ for the MFCC log-compression stage, exact in both
    * engines: `logFix(x) = (bitlen(x)−1)·[[LogScale]] + LogTable(mant)`
    * where `mant` is the [[LogMantBits]] bits after the leading 1 —
    * integer-only given the 64-entry table (built once from
    * `log2(1 + i/64)`, quantized ×[[LogScale]]). `x ≤ 0 → 0` by
    * definition (digital silence has no level). The oracle replays it
    * with `length(bin(x))` + shifts + the table as VALUES. */
  val LogScale = 1024L
  val LogMantBits = 6
  val LogTable: Array[Long] = Array.tabulate(1 << LogMantBits)(i =>
    Math.round(math.log(1 + i / 64.0) / math.log(2.0) * LogScale))
  def logFix(x: Long): Long =
    if (x <= 0) 0L
    else {
      val intPart = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val mant =
        if (intPart >= LogMantBits) (x >> (intPart - LogMantBits)) & 63
        else (x << (LogMantBits - intPart)) & 63
      intPart * LogScale + LogTable(mant.toInt)
    }

  /** DCT-II basis over the [[MelBins]] log-mel energies, quantized to
    * integer weights ×64 like [[MelWeights]]:
    * `DctWeights(c)(m) = round(cos(π·c·(2m+1)/(2·MelBins))·64)`. Row 0 is
    * the all-64 energy term; rows 1.. are the cepstral shapes. */
  val DctWeights: Array[Array[Long]] = Array.tabulate(MelBins, MelBins)(
    (c, m) => Math.round(math.cos(math.Pi * c * (2 * m + 1) / (2.0 * MelBins)) * 64))

  /** MFCC frame features — the standard speech front-end completed:
    * DFT band powers → mel fold ([[melEnergiesOf]]) → fixed-point log
    * ([[logFix]]) → integer DCT-II ([[DctWeights]]). Every coefficient is
    * exact int64 (log ≤ 63·1024, ×64 ×[[MelBins]] ≪ 2^31), so the oracle
    * replays the whole chain. One typed map pass; payloads never leave
    * the task. Output (asset_id, f, c0..c{MelBins-1}). */
  def audioMfcc(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        val cs = mfccFrames(a)
        cs.indices.map(f => (a.asset_id, f, cs(f)(0), cs(f)(1), cs(f)(2), cs(f)(3)))
      }
      .toDF("asset_id", "f", "c0", "c1", "c2", "c3")
  }

  /** The per-frame MFCC matrix (nF × [[MelBins]]) of one mono WAV asset —
    * ONE definition shared by [[audioMfcc]] and [[audioMfccDeltas]] so the
    * delta face differentiates exactly the coefficients the MFCC face
    * gates. */
  private def mfccFrames(a: MediaAsset): Array[Array[Long]] = {
    require(a.format == "wav", s"mfccFrames needs wav, got ${a.format}")
    val (_, channels, ss) = WavCodec.decode(a.payload)
    require(channels == 1, s"mfccFrames expects mono, got $channels")
    val nF = ss.length / AudioFpFrame
    Array.tabulate(nF) { f =>
      val lg = melEnergiesOf(ss, f).map(logFix)
      Array.tabulate(MelBins) { c =>
        var acc = 0L
        var m = 0
        while (m < MelBins) { acc += DctWeights(c)(m) * lg(m); m += 1 }
        acc
      }
    }
  }

  /** Δ / ΔΔ cepstral features — the standard ASR front-end finisher: the
    * 2-point slope Δc(t) = c(t+1) − c(t−1) over interior frames and its
    * second difference ΔΔ over the Δ stream, all exact int64 on the shared
    * [[mfccFrames]] coefficients. One row PER ASSET straight out of the
    * typed map (frames are task-local): interior counts, the non-telescoping
    * |Δ| energies (a plain ΣΔ telescopes to 4 endpoint terms and would gate
    * nothing), and order-sensitive fingerprints of the Δc₁ / ΔΔc₁ streams. */
  def audioMfccDeltas(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val P = graft.ops.TextOps.P
    val B2 = graft.ops.TextOps.B2
    def fp(xs: Seq[Long]): Long =
      xs.foldLeft(0L)((h, x) => (h * B2 + ((x % P) + P) % P) % P)
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .map { a =>
        val cs = mfccFrames(a)
        val n = cs.length
        val d = (1 until math.max(n - 1, 1)).map(t =>
          Array.tabulate(MelBins)(c => cs(t + 1)(c) - cs(t - 1)(c)))
        val dd = (1 until math.max(d.length - 1, 1)).map(t =>
          d(t + 1)(1) - d(t - 1)(1))
        (a.asset_id, d.length.toLong, dd.length.toLong,
          d.map(x => math.abs(x(0))).sum, d.map(x => math.abs(x(1))).sum,
          fp(d.map(_(1))), fp(dd))
      }
      .toDF("asset_id", "n_d", "n_dd", "sum_abs_d0", "sum_abs_d1",
        "d1_fp", "dd1_fp")
  }

  /** VAD fixture: the [[wavAssetsFromDocuments]] sample map with SILENCE
    * GAPS planted so the segmenter has real segment structure to find —
    * after every `3 + doc_id % 3` full content frames, two frames (64
    * samples) of digital silence. Content truncates to whole frames
    * before gapping so every block boundary is frame-aligned, which is
    * what lets the oracle rebuild the identical gapped stream with list
    * slicing. Uniform-energy audio segments trivially (the whole clip is
    * one run over the half-mean threshold — measured: 500/500 single-
    * segment on the ungapped fixture); the gaps make n_segments/longest/
    * starts_fp informative. */
  def vadAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"wav fixture requires ASCII text (doc $id)") // the WAV contract
        val raw = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val nF0 = raw.length / AudioFpFrame
        val content = raw.take(nF0 * AudioFpFrame)
        val per = (3 + id % 3).toInt
        val blockLen = per * AudioFpFrame
        val out = Array.newBuilder[Short]
        var b = 0
        while (b * blockLen < content.length) {
          val end = math.min((b + 1) * blockLen, content.length)
          out ++= content.slice(b * blockLen, end)
          out ++= Array.fill(2 * AudioFpFrame)(0.toShort)
          b += 1
        }
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "wav", WavCodec.encode(rate, 1, out.result()),
          0, 0, 1, rate)
      }.toDF()
  }

  /** Energy VAD (voice-activity detection) — the speech-curation segmenter
    * (a training pipeline drops non-speech before transcribing): per-frame
    * total mel energy, per-asset threshold T = totalE / (2·nF) (half the
    * mean — integer division, deterministic), speech = E > T, segments =
    * maximal speech runs. One typed map pass computes the whole state
    * machine in-task; the oracle replays it relationally (threshold from
    * the energy totals, runs via the gaps-and-islands row_number trick).
    * Output (asset_id, n_frames, n_speech, n_segments, longest,
    * starts_fp) where starts_fp folds the 1-based segment starts in
    * order. */
  def audioVad(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .map { a =>
        require(a.format == "wav", s"audioVad needs wav, got ${a.format}")
        val (_, channels, ss) = WavCodec.decode(a.payload)
        require(channels == 1, s"audioVad expects mono, got $channels")
        val nF = ss.length / AudioFpFrame
        val e = Array.tabulate(nF)(f => melEnergiesOf(ss, f).sum)
        val t = if (nF == 0) 0L else e.sum / (2L * nF)
        var nSpeech = 0L; var nSeg = 0L; var longest = 0L
        var run = 0L; var fp = 0L
        var f = 0
        while (f < nF) {
          if (e(f) > t) {
            if (run == 0) {
              nSeg += 1
              fp = java.lang.Math.floorMod(
                fp * TextOps.B2 + (f + 1), TextOps.P)
            }
            run += 1; nSpeech += 1
            if (run > longest) longest = run
          } else run = 0
          f += 1
        }
        (a.asset_id, nF.toLong, nSpeech, nSeg, longest, fp)
      }
      .toDF("asset_id", "n_frames", "n_speech", "n_segments", "longest",
        "starts_fp")
  }

  /** Per-asset silence audit for the audio-curation filter: frame counts
    * plus the number of DIGITALLY SILENT analysis frames (every sample 0 —
    * the planted lead-in of [[fpWavAssetsFromDocuments]], and exactly what
    * a Σ|s| = 0 energy rule detects). One typed decode pass. */
  def audioSilence(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      require(a.format == "wav", s"audioSilence needs wav, got ${a.format}")
      val (_, channels, ss) = WavCodec.decode(a.payload)
      require(channels == 1, s"audioSilence expects mono, got $channels")
      val nF = ss.length / AudioFpFrame
      var silent = 0L
      var f = 0
      while (f < nF) {
        var e = 0L
        var i = 0
        while (i < AudioFpFrame) { e += math.abs(ss(f * AudioFpFrame + i).toLong); i += 1 }
        if (e == 0) silent += 1
        f += 1
      }
      (a.asset_id, nF.toLong, silent)
    }.toDF("asset_id", "n_frames", "n_silent")
  }

  def audioFingerprints(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        require(a.format == "wav", s"audioFingerprints needs wav, got ${a.format}")
        val (_, channels, ss) = WavCodec.decode(a.payload)
        require(channels == 1, s"audioFingerprints expects mono, got $channels")
        val nF = ss.length / AudioFpFrame
        val bytes = Array.tabulate(nF) { f =>
          val e = bandEnergiesOf(ss, f)
          var b = 0L
          var j = 0
          while (j < AudioFpBands - 1) {
            if (e(j) > e(j + 1)) b |= 1L << j
            j += 1
          }
          b
        }
        (0 to nF - AudioFpWindow).map { f =>
          var h = 0L
          var w = 0
          while (w < AudioFpWindow) {
            h = (h * TextOps.B2 + bytes(f + w)) % TextOps.P
            w += 1
          }
          (a.asset_id, f, h)
        }
      }
      .toDF("asset_id", "frame_idx", "fp")
  }

  /** Deterministic COMPRESSED-audio asset table: each doc becomes a
    * genuine G.711 µ-law WAV (format tag 7, 18-byte fmt chunk, one code
    * byte per sample) whose code stream is the text's bytes with the sign
    * bit keyed to byte parity — so the EXPANDED signal swings both signs
    * and the oracle can replay code → linear → stats from the text alone
    * (µ-law expansion is an exact integer formula). */
  def mulawWavAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"mulaw fixture requires ASCII text (doc $id)")
        val codes = Array.tabulate(text.length) { i =>
          val b = text.charAt(i).toInt
          (b + 128 * (b % 2)).toByte
        }
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "wav",
          WavCodec.encodeMulaw(rate, 1, codes, junkChunk = id % 5 == 0),
          0, 0, 1, rate)
      }.toDF()
  }

  /** Deterministic REAL-GIF asset table: each doc becomes a genuine
    * GIF89a (grayscale global color table, comment extension, REAL
    * adaptive-LZW image data) whose pixels are the text's bytes tiled
    * over a (doc_id-derived) w×h grid. The corpus cycles the descriptor
    * shapes by id%4: plain / INTERLACED (rows transported in the
    * four-pass order, scattered back on decode) / LOCAL color table
    * (entry j = (j, 7j mod 256, 13j mod 256), overriding the grayscale
    * GCT → decoded value is that entry's integer luma) / both. LZW is
    * lossless, so the oracle recomputes decoded-pixel stats from the
    * tiling (+ LCT luma map) alone — an entropy bug, a de-interlace bug
    * (row-permuted output) or a palette-selection bug all break the
    * position-sensitive value match. */
  def gifAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"gif fixture requires ASCII text (doc $id)")
        val w = (id % 11 + 1).toInt
        val h = (id % 6 + 1).toInt
        val px = Array.tabulate(w * h)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        MediaAsset(id, "gif",
          GifCodec.encode(w, h, px,
            interlaced = id % 4 == 1 || id % 4 == 3,
            localPalette = id % 4 == 2 || id % 4 == 3), w, h, 1, 0)
      }.toDF()
  }

  /** Deterministic ANIMATED-GIF asset table: each doc becomes a genuine
    * multi-frame GIF89a (NETSCAPE loop extension, per-frame GCE delays) of
    * `2 + id % 3` frames; frame f's pixels are the text tiled with offset
    * 11·f (frames differ, so a walk that returns the wrong frame fails the
    * value match) and its delay is `4 + f` centiseconds. Descriptor
    * variants cycle by id%4 exactly like the still fixture (plain /
    * interlaced / LCT / both), applied to every frame. */
  def animGifAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"animated-gif fixture requires ASCII text (doc $id)")
        val w = (id % 7 + 2).toInt
        val h = (id % 5 + 2).toInt
        val nf = (2 + id % 3).toInt
        val frames = (0 until nf).map { f =>
          Array.tabulate(w * h)(i =>
            (if (text.isEmpty) 0
             else text.charAt((11 * f + i) % text.length).toInt).toByte)
        }
        MediaAsset(id, "gif",
          GifCodec.encodeAnimated(w, h, frames, (0 until nf).map(4 + _),
            interlaced = id % 4 == 1 || id % 4 == 3,
            localPalette = id % 4 == 2 || id % 4 == 3), w, h, 1, 0)
      }.toDF()
  }

  /** Planting constants of [[animGifCompanionAssetsFromDocuments]]: the
    * temporal-shift companion scheme (every 6th doc, ids offset by 5·10⁷)
    * and the corpus-common SPLASH frame (a constant-gray intro card
    * opening every 5th animation — GIF is lossless and this fixture fixes
    * the geometry, so the splash frame's content hash is ONE value across
    * ~23% of the corpus: the skewed join key the containment cap drops).
    * Fixed geometry: frame identity is content, not size, and a fixed
    * grid is what makes the splash hash corpus-common. */
  val GifCompanionOffset = 50000000L
  val GifCompanionStep = 6L
  val GifSplashStep = 5L
  val GifSplashGray = 200
  val GifDedupW = 6
  val GifDedupH = 4

  /** ANIMATED-GIF asset table for temporal dedup: every doc becomes a
    * [[GifDedupW]]×[[GifDedupH]] animation of `2 + id % 3` frames (frame
    * f = text tiled at offset 11·f); every [[GifCompanionStep]]-th doc
    * ADDITIONALLY yields a one-frame TEMPORAL-SHIFT companion (the re-cut
    * shape — frame f carries pattern f+1, so nf−1 of nf frame hashes are
    * shared); every [[GifSplashStep]]-th doc's animation (and its
    * companion) opens with the corpus-common constant splash frame. */
  def animGifCompanionAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        require(text.forall(_ < 128),
          s"gif dedup fixture requires ASCII text (doc $id)")
        val w = GifDedupW; val h = GifDedupH
        val nf = (2 + id % 3).toInt
        def frame(pattern: Int): Array[Byte] =
          Array.tabulate(w * h)(i =>
            (if (text.isEmpty) 0
             else text.charAt((11 * pattern + i) % text.length).toInt).toByte)
        val splash: Seq[Array[Byte]] =
          if (id % GifSplashStep == 0)
            Seq(Array.fill(w * h)(GifSplashGray.toByte))
          else Seq.empty
        def gif(shift: Int): Array[Byte] = {
          val frames = splash ++ (0 until nf).map(f => frame(f + shift))
          GifCodec.encodeAnimated(w, h, frames, frames.indices.map(4 + _))
        }
        val base = MediaAsset(id, "gif", gif(0), w, h, 1, 0)
        if (id % GifCompanionStep == 0)
          Seq(base, MediaAsset(id + GifCompanionOffset, "gif", gif(1), w, h, 1, 0))
        else Seq(base)
      }.toDF()
  }

  /** Frame CONTENT hashes of animated GIFs — the lossless-format twin of
    * [[videoPhashes]]: GIF decode is exact, so the polynomial hash of the
    * decoded pixel bytes IS a frame identity (no perceptual tolerance
    * needed), 20 bytes out per frame, payloads never leave the task. The
    * same [[graft.ops.DedupOps.hashSetContainmentPairs]] core (with its
    * df cap — splash/intro frames are corpus-common) scores the pairs.
    *
    * Because hash EQUALITY is the frame identity here (no pixel-level
    * verify), the hash is the PACKED DOUBLE-PRIME 62-bit key of the
    * TextOps hash-width policy: the pixel polynomial folded mod P and mod
    * P2 (base B2), packed `h1 * P2 + h2` — a 31-bit space saturates at
    * 100 TB frame counts, the ~2⁶⁰ space does not, and the pack stays
    * exact in DuckDB BIGINT math for the oracle. */
  def gifFrameHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].flatMap { a =>
      val (_, _, frames) = GifCodec.decodeFrames(a.payload)
      frames.zipWithIndex.map { case ((_, g), fi) =>
        var h1 = 0L
        var h2 = 0L
        var i = 0
        while (i < g.length) {
          val px = (g(i) & 0xff).toLong
          h1 = (h1 * TextOps.B2 + px) % TextOps.P
          h2 = (h2 * TextOps.B2 + px) % TextOps.P2
          i += 1
        }
        (a.asset_id, fi, h1 * TextOps.P2 + h2)
      }
    }.toDF("asset_id", "frame_idx", "fh")
  }

  /** Per-frame positional features of animated GIFs: one row per frame
    * with its GCE delay and the position-sensitive pixel stats. One typed
    * map pass; payloads never leave the task. */
  def gifFrameFeatures(assets: DataFrame)
      : org.apache.spark.sql.Dataset[GifFrameFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].flatMap { a =>
      val (_, _, frames) = GifCodec.decodeFrames(a.payload)
      frames.zipWithIndex.map { case ((delay, g), fi) =>
        val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
        GifFrameFeatures(a.asset_id, fi, delay, g.length.toLong, mean, head, wsum)
      }
    }
  }

  /** Position-sensitive decoded-pixel features of GIF assets — the
    * [[decodeGray16Features]] shape over [[graft.ops.GifCodec.decode]],
    * so a de-interlace bug that permutes rows without moving the mean
    * still breaks the value match. */
  def gifPositionalFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, g) = GifCodec.decode(a.payload)
      val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
      Gray16Features(a.asset_id, a.format, g.length.toLong, mean, head, wsum)
    }
  }

  /** Deterministic PREDICTIVE-codec asset table: each doc becomes a
    * genuine IMA ADPCM WAV (format 0x11 — 4-bit block-predictive codes,
    * per-block header, `fact`-trimmed) over the same affine text-byte
    * sample map as the PCM fixture. Lossy, but the fused encode→decode
    * chain is an exact integer state machine, so the decoded samples are
    * a deterministic function of the text — the oracle replays the whole
    * predictor/step-index recursion. blockAlign 8 → 9 samples/block keeps
    * many block boundaries (header snapshots, final-block padding) inside
    * every document. */
  def adpcmWavAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 44100)
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(_._2.nonEmpty) // the codec requires >= 1 sample (empty docs have none)
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"adpcm fixture requires ASCII text (doc $id)")
        val samples = Array.tabulate(text.length)(i =>
          ((text.charAt(i) - 80) * 257).toShort)
        val rate = rates((id % 3).toInt)
        MediaAsset(id, "wav", WavCodec.encodeAdpcm(rate, samples, blockAlign = 8),
          0, 0, 1, rate)
      }.toDF()
  }

  /** Deterministic REAL-PNG asset table from `documents`: each doc becomes
    * a genuine grayscale-8 PNG (signature, CRC'd chunk walk, DEFLATE'd
    * scanlines split across two IDAT chunks) whose pixels are the text's
    * bytes tiled over a (doc_id-derived) w×h grid. The per-row FILTER TYPE
    * cycles through all five spec filters by id, so the corpus itself
    * drives every unfilter branch of the decoder — and because the
    * compression round-trip is lossless, an oracle still recomputes the
    * decoded-pixel stats from the text + tiling arithmetic alone. */
  def pngAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // same LOUD ASCII contract as the BMP/WAV fixtures: the oracle
        // tiles unicode() code points, the encoder tiles chars truncated
        // to a byte — identical only below 128.
        require(text.forall(_ < 128),
          s"png fixture requires ASCII text (doc $id)")
        val w = (id % 9 + 1).toInt
        val h = (id % 7 + 1).toInt
        val gray = Array.tabulate(w * h)(i =>
          if (text.isEmpty) 0.toByte else text.charAt(i % text.length).toByte)
        MediaAsset(id, "png", PngCodec.encode(w, h, gray, (id % 5).toInt),
          w, h, 1, 0)
      }.toDF()
  }

  /** BILINEAR RESIZE to a fixed model-input grid — the real preprocessing
    * resize (nearest-neighbor is the fast path, bilinear is what training
    * pipelines actually normalize with). Integer-exact ALIGN-CORNERS
    * mapping: destination (x, y) samples source position
    * (x·(w−1)/(dw−1), y·(h−1)/(dh−1)); with D = dw−1, E = dh−1,
    * px = x·(w−1) = ix·D + nx and py = y·(h−1) = iy·E + ny,
    *   out = (s00·(D−nx)·(E−ny) + s01·nx·(E−ny)
    *        + s10·(D−nx)·ny + s11·nx·ny) / (D·E)
    * with truncating division (DuckDB `//`), taps clamped at the last
    * row/column (their weights are zero exactly when clamping engages).
    * Degenerate 1-wide/1-tall sources (the fixture includes them) hit the
    * nx = 0 / ny = 0 paths everywhere. One typed map pass over the
    * grayscale-PNG decode. */
  def imageBilinearFeatures(assets: DataFrame, dw: Int, dh: Int)
      : org.apache.spark.sql.Dataset[Gray16Features] = {
    require(dw > 1 && dh > 1, "destination dims must exceed 1 for align-corners")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      require(a.format == "png", s"imageBilinearFeatures needs png, got ${a.format}")
      val (w, h, g) = PngCodec.decode(a.payload)
      val dD = (dw - 1).toLong
      val eE = (dh - 1).toLong
      def s(yy: Int, xx: Int): Long = (g(yy * w + xx) & 0xff).toLong
      var sum = 0L
      var wsum = 0L
      val head = new Array[Long](math.min(12, dw * dh))
      var k = 0
      var y = 0
      while (y < dh) {
        val py = y.toLong * (h - 1)
        val iy = (py / eE).toInt
        val ny = py % eE
        val iy1 = math.min(iy + 1, h - 1)
        var x = 0
        while (x < dw) {
          val px = x.toLong * (w - 1)
          val ix = (px / dD).toInt
          val nx = px % dD
          val ix1 = math.min(ix + 1, w - 1)
          val v = (s(iy, ix) * (dD - nx) * (eE - ny) +
                   s(iy, ix1) * nx * (eE - ny) +
                   s(iy1, ix) * (dD - nx) * ny +
                   s(iy1, ix1) * nx * ny) / (dD * eE)
          sum += v
          wsum += v * (k + 1)
          if (k < head.length) head(k) = v
          k += 1
          x += 1
        }
        y += 1
      }
      val n = dw * dh
      Gray16Features(a.asset_id, a.format, n.toLong, sum.toDouble / n,
        head, wsum)
    }
  }

  /** Position-sensitive decoded-pixel features of grayscale PNGs — the
    * [[decodeGray16Features]] shape over [[graft.ops.PngCodec.decode]].
    * A stateless typed map, so it applies to STREAMING asset Datasets
    * unchanged (the mm_stream_decode face). */
  def pngPositionalFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, g) = PngCodec.decode(a.payload)
      val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
      Gray16Features(a.asset_id, a.format, g.length.toLong, mean, head, wsum)
    }
  }

  /** Deterministic 16-BIT grayscale PNG asset table: sample i is the
    * 16-bit value `text[i]·256 + text[i+1]` (tiled) — both bytes of every
    * big-endian pair carry signal, so a byte-order or pairing bug changes
    * the values. Filter types cycle through all five by id; ODD doc_ids
    * are Adam7-INTERLACED (even sequential), so the corpus drives the
    * seven-pass scatter path. Lossless round trip: the oracle recomputes
    * the decoded stats from the tiling arithmetic alone. */
  def png16AssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"png16 fixture requires ASCII text (doc $id)")
        val w = (id % 9 + 1).toInt
        val h = (id % 7 + 1).toInt
        def c(k: Int): Int =
          if (text.isEmpty) 0 else text.charAt(k % text.length).toInt
        val vs = Array.tabulate(w * h)(i => c(i) * 256 + c(i + 1))
        MediaAsset(id, "png",
          PngCodec.encodeGray16(w, h, vs, (id % 5).toInt,
            interlaced = id % 2 == 1),
          w, h, 1, 0)
      }.toDF()
  }

  /** Deterministic 16-BIT TRUECOLOR PNG asset table (color type 2 at bit
    * depth 16 — the last PNG depth face): channel k of pixel i carries
    * c(3i+k)·256 + c(3i+k+1) over the text bytes, filter types cycle all
    * five by id over bpp = 6 scanlines (the spec's widest "left" offset),
    * odd ids are Adam7-interlaced. Lossless, so the oracle recomputes the
    * decoded samples from the tiling alone — a bpp-6 filter-offset bug, a
    * byte-order slip, or an interlace scatter bug breaks the
    * position-sensitive match. */
  def png16RgbAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"png16rgb fixture requires ASCII text (doc $id)")
        val w = (id % 9 + 1).toInt
        val h = (id % 7 + 1).toInt
        def c(k: Int): Int =
          if (text.isEmpty) 0 else text.charAt(k % text.length).toInt
        val vs = Array.tabulate(w * h * 3)(i => c(i) * 256 + c(i + 1))
        MediaAsset(id, "png",
          PngCodec.encodeRgb16(w, h, vs, (id % 5).toInt,
            interlaced = id % 2 == 1),
          w, h, 3, 0)
      }.toDF()
  }

  /** Decode 16-bit truecolor PNGs ([[PngCodec.decodeRgb16]]) into
    * [[Gray16Features]] (n/mean/head/wsum over the flattened channel
    * samples) — a typed map pass; payloads never leave the task. */
  def decodeRgb16Features(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, vs) = PngCodec.decodeRgb16(a.payload)
      val (mean, head, wsum) = positionalStats(vs.length, i => vs(i).toLong)
      Gray16Features(a.asset_id, a.format, vs.length.toLong, mean, head, wsum)
    }
  }

  /** Decode 16-bit grayscale PNGs ([[PngCodec.decodeGray16]]) into
    * [[Gray16Features]] — a typed map pass; payloads never leave the
    * task. */
  def decodeGray16Features(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (w, h, vs) = PngCodec.decodeGray16(a.payload)
      val (mean, head, wsum) = positionalStats(vs.length, i => vs(i).toLong)
      Gray16Features(a.asset_id, a.format, vs.length.toLong, mean, head, wsum)
    }
  }

  /** Deterministic COLOR-PNG asset table from `documents`: even doc_ids
    * become truecolor RGB8 PNGs (color type 2 — the format real corpora
    * actually carry) whose RGB bytes are the text tiled over w×h×3; odd
    * doc_ids become PALETTE PNGs (color type 3) whose indices are the text
    * bytes tiled over w×h through a fixed 256-entry PLTE with entry j =
    * (j, 7j mod 256, 13j mod 256). Filter types cycle through all five by
    * id exactly like the grayscale fixture, so both truecolor (bpp = 3
    * "left" neighbor) and palette unfiltering are driven by the corpus —
    * and the lossless round-trip lets an oracle recompute the decoded RGB
    * stats from text + tiling + palette arithmetic alone. */
  def pngColorAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val plte = Array.tabulate(256 * 3) { k =>
      val j = k / 3
      (k % 3 match {
        case 0 => j
        case 1 => (j * 7) % 256
        case 2 => (j * 13) % 256
      }).toByte
    }
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // same LOUD ASCII contract as the other codec fixtures
        require(text.forall(_ < 128),
          s"png color fixture requires ASCII text (doc $id)")
        val w = (id % 9 + 1).toInt
        val h = (id % 7 + 1).toInt
        val payload = if (id % 2 == 0) {
          val rgb = Array.tabulate(w * h * 3)(i =>
            if (text.isEmpty) 0.toByte else text.charAt(i % text.length).toByte)
          PngCodec.encodeRgb(w, h, rgb, (id % 5).toInt)
        } else {
          val idx = Array.tabulate(w * h)(i =>
            if (text.isEmpty) 0.toByte else text.charAt(i % text.length).toByte)
          PngCodec.encodePalette(w, h, idx, plte, (id % 5).toInt)
        }
        MediaAsset(id, "png", payload, w, h, 3, 0)
      }.toDF()
  }

  /** Audio decode + signal-stat extraction over WAV assets: same typed
    * per-partition shape as [[decodeFeatures]] (codec context per task, no
    * shuffle, payload never leaves the task), but the decode is the REAL
    * RIFF/PCM parse. Non-WAV formats fail loudly — silence-detection
    * stats computed off an undecoded payload would be garbage. */
  def audioFeatures(assets: DataFrame): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.map { a =>
        a.format match {
          case "wav"  => WavCodec.decodeFeatures(a)
          case "flac" => FlacCodec.decodeFeatures(a)
          case "aiff" => AiffCodec.decodeFeatures(a)
          case f => throw new IllegalArgumentException(
            s"audioFeatures: unsupported format $f")
        }
      })
  }

  /** Frame-level audio features (decode fused with framing in one typed
    * pass, one OUTPUT ROW per analysis frame): the expansion is bounded by
    * `maxFrames` per asset, and frames leave the task as plain rows, so
    * downstream VAD-style filters run as ordinary predicates. */
  def audioFrames(assets: DataFrame, frameSize: Int, maxFrames: Int): Dataset[AudioFrame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.flatMap { a =>
        require(a.format == "wav", s"audioFrames needs wav, got ${a.format}")
        WavCodec.frameFeatures(a, frameSize, maxFrames)
      })
  }

  /** Decode/feature-extract: typed per-partition iteration
    * (`mapPartitions`) — the shape a real codec needs (native context
    * reused across a partition's assets, no shuffle, payload bytes never
    * leave the task). Repartition by `format` first so one task runs one
    * codec. Formats route to their decoder: `bmp` parses the real byte
    * layout (BmpCodec); formats the sandbox cannot decode without native
    * codecs fall back to the honest stub. */
  def decodeFeatures(assets: DataFrame): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      // range-partition on (format, id): tasks stay (mostly) single-format
      // for codec reuse while parallelism scales with the corpus, not with
      // the number of formats
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.map {
        case a if a.format == "bmp"  => BmpCodec.decodeFeatures(a)
        case a if a.format == "png"  => PngCodec.decodeFeatures(a)
        case a if a.format == "jpeg" => JpegCodec.decodeFeatures(a)
        case a if a.format == "gif"  => GifCodec.decodeFeatures(a)
        case a                       => FakeDecoder.decode(a)
      })
  }

  /** ViT-style PATCH extraction over decodable images: the w×h pixel grid
    * splits into non-overlapping `patch`×`patch` tiles over the floor grid
    * (the standard crop-to-multiple; right/bottom remainders drop), each
    * tile emitted as ONE ROW carrying its flattened row-major RGB values —
    * the unit a patch-embedding layer consumes. Decode and tiling fuse in
    * one typed pass; fan-out is bounded at (w/p)·(h/p) rows per asset, and
    * the full image never leaves the task — only patch-sized vectors do.
    * (Real pipelines hand these rows to the tokenizer/projection as-is;
    * at 100 TB the point is that patching is a map-side reshape, not a
    * shuffle.) BMP assets only — the one fully-decodable format here. */
  def imagePatches(assets: DataFrame, patch: Int): Dataset[ImagePatch] = {
    require(patch > 0, "patch size must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        // per-row format ROUTING, matching decodeFeatures' stance: bmp
        // parses the fixed layout, png runs the full chunk-walk/inflate/
        // unfilter path (truecolor and palette expand to RGB; grayscale
        // replicates to 3 channels — the standard channel-expansion a
        // patch-embedding layer expects); anything else fails loudly
        // rather than "parsing" a payload whose header happens to fit
        val (w, h, rgb) = a.format match {
          case "bmp" => BmpCodec.decode(a.payload)
          case "png" => PngCodec.decodeRgb(a.payload) // one parse: rgbOf inside
          case "jpeg" => // baseline grayscale: replicate to 3 channels
            val (jw, jh, g) = JpegCodec.decodeGray(a.payload)
            (jw, jh, g.flatMap(b => Array(b, b, b)))
          case "gif" => // palette-expanded grayscale, replicated likewise
            val (gw, gh, g) = GifCodec.decode(a.payload)
            (gw, gh, g.flatMap(b => Array(b, b, b)))
          case f => throw new IllegalArgumentException(
            s"imagePatches needs bmp, png, gif or jpeg, got $f")
        }
        for {
          py <- 0 until h / patch
          px <- 0 until w / patch
        } yield {
          val vals = new Array[Long](patch * patch * 3)
          var sum = 0L
          var k = 0
          var dy = 0
          while (dy < patch) {
            var dx = 0
            while (dx < patch) {
              var c = 0
              while (c < 3) {
                val v = rgb((((py * patch + dy) * w) + (px * patch + dx)) * 3 + c) & 0xff
                vals(k) = v.toLong; sum += v; k += 1; c += 1
              }
              dx += 1
            }
            dy += 1
          }
          ImagePatch(a.asset_id, py, px, vals, sum.toDouble / vals.length)
        }
      }
  }

  /** Resize + feature-extract fused in ONE typed per-partition pass (the
    * codec context is opened once per task and reused for both ops — the
    * shape a real decoder/scaler pipeline needs). The resized payload stays
    * inside the task; only dimensions and stats of the RESIZED bytes come
    * out. */
  def resizeFeatures(assets: DataFrame, stride: Int = 2): Dataset[ResizedFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.map {
        case a if a.format == "bmp"  => BmpCodec.resizeFeatures(a, stride)
        case a if a.format == "png"  => PngCodec.resizeFeatures(a, stride)
        case a if a.format == "jpeg" => JpegCodec.resizeFeatures(a, stride)
        case a =>
          val r = FakeDecoder.resize(a, stride)
          val f = FakeDecoder.decode(r)
          ResizedFeatures(a.asset_id, a.format, r.width, r.height,
            f.n_bytes, f.mean_byte)
      })
  }

  /** Metadata + frame-sampling over the binary payload with pure Catalyst
    * expressions (no decode): size, a rolling-hash checksum of the decoded
    * char stream (binary → string round-trip), and up to `maxFrames` bytes
    * sampled every `stride` positions — the "thumbnail strip" access
    * pattern, reading only the projected columns. */
  def sampleFrames(assets: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame = {
    val decoded = decode(col("payload"), "UTF-8")
    val nFrames = (floor((length(decoded) - 1) / stride) + 1).cast("long")
    val frames = transform(
      sequence(lit(0L), least(nFrames, lit(maxFrames.toLong)) - 1),
      i => ascii(decoded.substr(i.cast("int") * stride + 1, lit(1))).cast("string"))
    assets.select(
      col("asset_id"), col("format"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      TextOps.fingerprint(TextOps.tokens(decoded)).as("checksum"),
      concat_ws(",", frames).as("frame_codes"))
  }

  /** Deterministic REAL-JPEG asset table from `documents`: each doc
    * becomes a genuine baseline grayscale JPEG (SOI/DQT/SOF0/DHT/SOS
    * markers, Annex-K Huffman tables, DC DPCM, byte stuffing) whose source
    * pixels are the text's bytes tiled over an 8-multiple w×h grid. JPEG
    * is LOSSY, but [[JpegCodec]]'s transform chain is integer-exact, so
    * the decoded pixels are a deterministic function of the tiling — the
    * oracle replays encode→decode arithmetic without touching the
    * bitstream (which the entropy layer transports exactly). */
  def jpegAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // same LOUD ASCII contract as the other codec fixtures
        require(text.forall(_ < 128),
          s"jpeg fixture requires ASCII text (doc $id)")
        val w = (8 * (id % 3 + 1)).toInt
        val h = (8 * (id % 2 + 1)).toInt
        val gray = Array.tabulate(w * h)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        // every 4th doc carries RESTART MARKERS (DRI + RSTn every 2 MCUs):
        // the corpus itself drives the resync/predictor-reset path, and
        // the decoded pixels are unchanged (entropy transport only), so
        // the oracle needs no change at all
        MediaAsset(id, "jpeg",
          JpegCodec.encodeGray(w, h, gray,
            restartInterval = if (id % 4 == 0) 2 else 0), w, h, 1, 0)
      }.toDF()
  }

  /** Shared positional-stats accumulation behind every Gray16Features
    * face: (mean, head ≤ 12 values, Σ v(i)·(i+1)) over `n` values read
    * through `at` — ONE definition of the position-weighted checksum
    * contract, so the oracle-facing arithmetic cannot drift between
    * codec faces. */
  private def positionalStats(n: Int, at: Int => Long): (Double, Array[Long], Long) = {
    var sum = 0L
    var wsum = 0L
    val head = new Array[Long](math.min(12, n))
    var i = 0
    while (i < n) {
      val v = at(i)
      sum += v
      wsum += v * (i + 1)
      if (i < head.length) head(i) = v
      i += 1
    }
    (if (n == 0) 0.0 else sum.toDouble / n, head, wsum)
  }

  /** Companion-asset id offset of [[progressiveJpegAssetsFromDocuments]]. */
  val ProgJpegCompanionOffset = 40000000L

  /** PROGRESSIVE-JPEG asset table: every doc becomes TWO real JPEGs of
    * the SAME pixel grid — a baseline SOF0 coding at doc_id and a
    * progressive SOF2 coding at doc_id + [[ProgJpegCompanionOffset]],
    * scan script alternating by id (even: successive-approximation
    * script with DC/AC refinement scans; odd: spectral-selection-only).
    * Both codings transport the IDENTICAL quantized coefficient grid
    * (progressive is entropy transport), so the decodes must be
    * byte-identical — the oracle replays the baseline decode chain once
    * per doc and expects it for both asset ids, which pins the whole
    * SOF2 scan-assembly logic positionally. */
  def progressiveJpegAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        require(text.forall(_ < 128),
          s"jpeg fixture requires ASCII text (doc $id)")
        val w = (8 * (id % 3 + 1)).toInt
        val h = (8 * (id % 2 + 1)).toInt
        val gray = Array.tabulate(w * h)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        Seq(
          MediaAsset(id, "jpeg", JpegCodec.encodeGray(w, h, gray), w, h, 1, 0),
          MediaAsset(id + ProgJpegCompanionOffset, "jpeg",
            JpegCodec.encodeGrayProgressive(w, h, gray,
              successiveApprox = id % 2 == 0), w, h, 1, 0))
      }.toDF()
  }

  /** Position-sensitive decoded-pixel features of 8-bit grayscale JPEGs —
    * the [[decodeGray16Features]] shape (head + Σ v(i)·(i+1) checksum)
    * over [[graft.ops.JpegCodec.decodeGray]], so a scan-assembly bug that
    * permutes or mis-places pixels without moving the mean still breaks
    * the value match. One typed map pass; payloads never leave the task. */
  def decodeGrayFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, g) = JpegCodec.decodeGray(a.payload)
      val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
      Gray16Features(a.asset_id, a.format, g.length.toLong, mean, head, wsum)
    }
  }

  /** PROGRESSIVE COLOR JPEG asset table: every doc becomes TWO real
    * JPEGs of the SAME RGB grid — the baseline 4:4:4 coding at doc_id and
    * a progressive SOF2 coding (interleaved DC scans, per-component AC
    * scans) at doc_id + [[ProgJpegCompanionOffset]], script alternating
    * by id parity. Decodes must be byte-identical (entropy transport),
    * which the positional oracle pins across the whole color chain. */
  def progressiveRgbJpegAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        require(text.forall(_ < 128),
          s"jpeg fixture requires ASCII text (doc $id)")
        val w = (8 * (id % 3 + 1)).toInt
        val h = (8 * (id % 2 + 1)).toInt
        val rgb = Array.tabulate(w * h * 3)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        Seq(
          MediaAsset(id, "jpeg", JpegCodec.encodeRgb(w, h, rgb), w, h, 3, 0),
          MediaAsset(id + ProgJpegCompanionOffset, "jpeg",
            JpegCodec.encodeRgbProgressive(w, h, rgb,
              successiveApprox = id % 2 == 0), w, h, 3, 0))
      }.toDF()
  }

  /** Position-sensitive decoded-RGB features (the [[decodeGray16Features]]
    * shape over [[graft.ops.JpegCodec.decodeRgb]]'s flattened bytes). */
  def decodeRgbPositionalFeatures(assets: DataFrame): org.apache.spark.sql.Dataset[Gray16Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].map { a =>
      val (_, _, g) = JpegCodec.decodeRgb(a.payload)
      val (mean, head, wsum) = positionalStats(g.length, i => (g(i) & 0xff).toLong)
      Gray16Features(a.asset_id, a.format, g.length.toLong, mean, head, wsum)
    }
  }

  /** Deterministic COLOR-JPEG asset table: each doc becomes a genuine
    * baseline YCbCr 4:4:4 JPEG whose source RGB bytes are the text tiled
    * over w×h×3 (the [[bmpAssetsFromDocuments]] layout). Lossy but
    * integer-deterministic end to end — color convert, DCT chain and the
    * inverse all replay in the oracle. */
  def jpegColorAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"jpeg color fixture requires ASCII text (doc $id)")
        val w = (8 * (id % 3 + 1)).toInt
        val h = (8 * (id % 2 + 1)).toInt
        val rgb = Array.tabulate(w * h * 3)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        MediaAsset(id, "jpeg",
          JpegCodec.encodeRgb(w, h, rgb,
            restartInterval = if (id % 5 == 0) 2 else 0), w, h, 3, 0)
      }.toDF()
  }

  /** Deterministic 4:2:0 COLOR-JPEG asset table: same RGB tiling as
    * [[jpegColorAssetsFromDocuments]] but encoded with the real-world
    * camera sampling — Y at 2×2, chroma subsampled 2× both directions
    * ([[JpegCodec.encodeRgb420]]). Dims are 16-multiples (whole MCUs).
    * Lossy but integer-deterministic end to end: the oracle replays color
    * convert, chroma subsample average, the DCT chain per grid, and the
    * replication upsample. */
  def jpeg420AssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"jpeg 4:2:0 fixture requires ASCII text (doc $id)")
        val w = (16 * (id % 2 + 1)).toInt
        val h = 16
        val rgb = Array.tabulate(w * h * 3)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        MediaAsset(id, "jpeg",
          JpegCodec.encodeRgb420(w, h, rgb,
            restartInterval = if (id % 3 == 0) 1 else 0), w, h, 3, 0)
      }.toDF()
  }

  /** Deterministic 4:2:2 COLOR-JPEG asset table (Y at 2×1, chroma
    * half-horizontal — the broadcast/MJPEG-hardware sampling): text bytes
    * tiled over w×h×3, 16×8 MCUs, every 3rd doc with restart markers.
    * Lossy but integer-exact, so the oracle replays the whole chain —
    * horizontal (c0+c1+1)/2 chroma averaging, per-component DCT
    * round-trip, horizontal-only replication upsample, inverse color
    * matrix — from the text alone. */
  def jpeg422AssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"jpeg 4:2:2 fixture requires ASCII text (doc $id)")
        val w = (16 * (id % 2 + 1)).toInt
        val h = (8 * (id % 3 + 1)).toInt
        val rgb = Array.tabulate(w * h * 3)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        MediaAsset(id, "jpeg",
          JpegCodec.encodeRgb422(w, h, rgb,
            restartInterval = if (id % 3 == 0) 1 else 0), w, h, 3, 0)
      }.toDF()
  }

  /** Deterministic 4:1:1 COLOR-JPEG asset table (Y at 4×1, chroma
    * quarter-horizontal — the DV/camcorder sampling): text bytes tiled
    * over w×h×3, 32×8 MCUs of four Y blocks + Cb + Cr, every 3rd doc
    * with restart markers. The oracle replays the whole chain with the
    * (c0+c1+c2+c3+2)/4 horizontal average and x//4 upsample indices. */
  def jpeg411AssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"jpeg 4:1:1 fixture requires ASCII text (doc $id)")
        val w = (32 * (id % 2 + 1)).toInt
        val h = (8 * (id % 3 + 1)).toInt
        val rgb = Array.tabulate(w * h * 3)(i =>
          (if (text.isEmpty) 0 else text.charAt(i % text.length).toInt).toByte)
        MediaAsset(id, "jpeg",
          JpegCodec.encodeRgb411(w, h, rgb,
            restartInterval = if (id % 3 == 0) 1 else 0), w, h, 3, 0)
      }.toDF()
  }

  /** Deterministic REAL-VIDEO asset table: each doc becomes a genuine
    * MJPEG AVI ([[AviCodec]]) of `2 + id % 3` grayscale-JPEG frames at
    * fps `10 + (id % 3) * 5`; frame `f`'s source pixels are the text's
    * bytes tiled with a per-frame offset of `7·f` (frames differ, so a
    * sampler that returns the wrong frame fails the value match). */
  def mjpegAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"mjpeg fixture requires ASCII text (doc $id)")
        val w = (8 * (id % 3 + 1)).toInt
        val h = (8 * (id % 2 + 1)).toInt
        val nf = (2 + id % 3).toInt
        val frames = (0 until nf).map { f =>
          val gray = Array.tabulate(w * h)(i =>
            (if (text.isEmpty) 0
             else text.charAt((7 * f + i) % text.length).toInt).toByte)
          JpegCodec.encodeGray(w, h, gray)
        }
        MediaAsset(id, "avi",
          AviCodec.encode(w, h, 10 + (id % 3).toInt * 5, 1, frames), w, h, 1, 0)
      }.toDF()
  }

  /** FRAME SAMPLING over real video: walk the AVI container, keep every
    * `frameStride`-th frame, decode each kept frame with the REAL JPEG
    * codec, emit one stats row per sampled frame. One typed map-side pass —
    * the payload bytes never leave the task, the skipped frames' JPEG
    * payloads are never entropy-decoded (the container walk indexes them
    * for free), and fan-out is bounded at ceil(n_frames / stride) rows per
    * asset. This is the shape a 100 TB video-curation stage needs: sampling
    * is a map, not a shuffle, and decode cost scales with SAMPLED frames. */
  def videoFrameFeatures(assets: DataFrame, frameStride: Int = 2): Dataset[VideoFrameFeatures] = {
    require(frameStride > 0, "frame stride must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        require(a.format == "avi",
          s"videoFrameFeatures needs avi, got ${a.format}")
        val v = AviCodec.decode(a.payload)
        (0 until v.frames.length by frameStride).map { fi =>
          val (w, h, g) = JpegCodec.decodeGray(v.frames(fi))
          require(w == v.width && h == v.height,
            s"frame $fi geometry ${w}x$h disagrees with container ${v.width}x${v.height}")
          var s = 0L
          var i = 0
          while (i < g.length) { s += g(i) & 0xff; i += 1 }
          VideoFrameFeatures(a.asset_id, fi, v.frames.length,
            v.rate.toDouble / v.scale, w, h, g.length.toLong,
            s.toDouble / g.length)
        }
      }
  }

  /** Companion-asset id offset and planting step of
    * [[mjpegCompanionAssetsFromDocuments]]. */
  val VideoCompanionOffset = 20000000L
  val VideoCompanionStep = 7L

  /** CORPUS-COMMON frame planting for [[mjpegCompanionAssetsFromDocuments]]:
    * every [[VideoCommonStep]]-th doc's video (and its temporal-shift
    * companion, when both plantings coincide at lcm(5,7) = 35) opens with a
    * constant-gray "title card" frame. A constant 8×8 block has EXACTLY
    * zero AC forward-DCT coefficients (the fixed-point cosine rows sum to
    * zero by the table's symmetry), so the lossy decode returns the
    * constant unchanged for EVERY geometry — and pHash of a constant image
    * is 0 (all AC coefficients equal the median). One hash value therefore
    * appears in ~n/5 of the corpus's videos: the skewed-join-key head
    * (black frames / intro cards) that [[graft.ops.DedupOps
    * .hashSetContainmentPairs]]'s `maxDocFreq` cap exists to drop. */
  val VideoCommonStep = 5L
  val TitleCardGray = 200

  /** MJPEG asset table for VIDEO temporal dedup: every doc becomes the
    * same AVI as [[mjpegAssetsFromDocuments]]; every
    * [[VideoCompanionStep]]-th doc ADDITIONALLY yields a companion video
    * (id + [[VideoCompanionOffset]], same geometry/fps/frame count, dims
    * still derived from the ORIGINAL doc_id) whose frame f carries the
    * original's frame f+1 pixel pattern — a one-frame TEMPORAL SHIFT, the
    * re-cut/re-keyframed shape video dedup exists for. Shifted frames are
    * byte-identical JPEGs to the original's (same tiling arithmetic), so
    * nf−1 of the nf frame hashes are shared and the companion's last
    * frame (pattern 7·nf, which the original never shows) is novel:
    * planted pairs at overlap (nf−1)/nf ∈ {1/2, 2/3, 3/4}, all ≥ the 0.5
    * operating point, replayable by the oracle from text + tiling alone.
    *
    * Every [[VideoCommonStep]]-th doc's video ADDITIONALLY opens with the
    * corpus-common constant-gray title-card frame (its companion too — a
    * re-cut keeps the intro card): one pHash value planted across ~n/5 of
    * the corpus, the skewed-key head the containment join's `maxDocFreq`
    * cap must drop. With the cap the title card leaves both `shared` and
    * the set sizes, so planted-pair scores are invariant under the
    * planting ((nf−1)/nf as above); WITHOUT the cap a title-carded
    * planted pair reports shared = nf, np = nf+1 — a value-visible
    * difference the oracle (which models the cap) fails on. */
  def mjpegCompanionAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        require(text.forall(_ < 128),
          s"mjpeg companion fixture requires ASCII text (doc $id)")
        val w = (8 * (id % 3 + 1)).toInt
        val h = (8 * (id % 2 + 1)).toInt
        val nf = (2 + id % 3).toInt
        val fps = 10 + (id % 3).toInt * 5
        def frame(pattern: Int): Array[Byte] = {
          val gray = Array.tabulate(w * h)(i =>
            (if (text.isEmpty) 0
             else text.charAt((7 * pattern + i) % text.length).toInt).toByte)
          JpegCodec.encodeGray(w, h, gray)
        }
        val title: Seq[Array[Byte]] =
          if (id % VideoCommonStep == 0)
            Seq(JpegCodec.encodeGray(w, h,
              Array.fill(w * h)(TitleCardGray.toByte)))
          else Seq.empty
        def avi(shift: Int): Array[Byte] =
          AviCodec.encode(w, h, fps, 1,
            title ++ (0 until nf).map(f => frame(f + shift)))
        val base = MediaAsset(id, "avi", avi(0), w, h, 1, 0)
        if (id % VideoCompanionStep == 0)
          Seq(base,
            MediaAsset(id + VideoCompanionOffset, "avi", avi(1), w, h, 1, 0))
        else Seq(base)
      }.toDF()
  }

  /** Per-frame perceptual hashes of real MJPEG video — the signature
    * stage of video temporal dedup: container walk, per-frame baseline
    * JPEG decode, [[phash64]] on each kept frame. One typed map-side
    * pass; payloads and frames never leave the task, 20 bytes per kept
    * frame come out. `frameStride` is the scale knob (the fixture's
    * videos are short, so the registered query keeps every frame; a real
    * corpus samples). */
  def videoPhashes(assets: DataFrame, frameStride: Int = 1): DataFrame = {
    require(frameStride > 0, "frame stride must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        require(a.format == "avi", s"videoPhashes needs avi, got ${a.format}")
        val v = AviCodec.decode(a.payload)
        (0 until v.frames.length by frameStride).map { fi =>
          val (w, h, g) = JpegCodec.decodeGray(v.frames(fi))
          (a.asset_id, fi, phash64(g, w, h))
        }
      }
      .toDF("asset_id", "frame_idx", "phash")
  }

  /** FRAME SAMPLING + PATCHING fused: the video-ViT input pipeline — keep
    * every `frameStride`-th frame, decode ONLY those, tile each decoded
    * grayscale grid into `patch`×`patch` tokens (floor grid, remainders
    * drop, like [[imagePatches]]). One typed map-side pass: payload bytes
    * and full frames never leave the task, only patch-sized vectors do;
    * fan-out is bounded at ceil(frames/stride)·(w/p)·(h/p) rows/asset. */
  def videoFramePatches(assets: DataFrame, frameStride: Int = 2,
                        patch: Int = 8): Dataset[VideoPatch] = {
    require(frameStride > 0 && patch > 0, "need positive stride and patch")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .flatMap { a =>
        require(a.format == "avi",
          s"videoFramePatches needs avi, got ${a.format}")
        val v = AviCodec.decode(a.payload)
        for {
          fi <- 0 until v.frames.length by frameStride
          (w, h, g) = JpegCodec.decodeGray(v.frames(fi))
          py <- 0 until h / patch
          px <- 0 until w / patch
        } yield {
          val vals = new Array[Long](patch * patch)
          var sum = 0L
          var k = 0
          var dy = 0
          while (dy < patch) {
            var dx = 0
            while (dx < patch) {
              val pv = g((py * patch + dy) * w + px * patch + dx) & 0xff
              vals(k) = pv.toLong; sum += pv; k += 1
              dx += 1
            }
            dy += 1
          }
          VideoPatch(a.asset_id, fi, py, px, vals, sum.toDouble / vals.length)
        }
      }
  }

  // -------------------------------------------------------------- pHash

  /** Integer DCT basis for the perceptual hash, fixed-point at 2^10:
    * PhashDct(u)(i) = round(cos((2i+1)·u·π/16) · 1024) — the 8-point
    * DCT-II row basis. All pHash arithmetic downstream of this table is
    * EXACT int64, so Spark and the DuckDB oracle (which interpolates these
    * very constants as literals) agree bitwise; floating trig never crosses
    * an engine boundary. */
  val PhashDctScale = 1024L
  val PhashDct: Array[Array[Long]] = Array.tabulate(8, 8)((u, i) =>
    Math.round(Math.cos((2 * i + 1) * u * Math.PI / 16) * PhashDctScale))

  /** 63-bit perceptual hash of a grayscale image (pHash, Zauner 2010 /
    * the classic DCT variant, integer-exact): (1) nearest-neighbor sample
    * onto the fixed 8×8 grid — pixel(i,j) = gray[(i·h/8)·w + j·w/8], all
    * integer division; (2) separable 2-D integer DCT with [[PhashDct]];
    * (3) drop the DC coefficient, take the MEDIAN of the 63 AC
    * coefficients (value at sorted index 31); (4) bit k = 1 iff
    * AC_k > median, k row-major. Brightness shifts move only DC, so a
    * globally brightened copy hashes IDENTICALLY — the invariance the
    * planted-companion fixture asserts end-to-end. */
  def phash64(gray: Array[Byte], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && gray.length >= w * h, s"bad image ${w}x$h")
    val px = new Array[Long](64)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        px(i * 8 + j) = (gray((i * h / 8) * w + (j * w / 8)) & 0xff).toLong
        j += 1
      }
      i += 1
    }
    // separable DCT: tmp(i)(v) = Σ_j px(i)(j)·C(v)(j); F(u)(v) = Σ_i
    // C(u)(i)·tmp(i)(v). Integer sums are associative, so this equals the
    // direct quadruple sum the oracle computes term-by-term.
    val tmp = new Array[Long](64)
    i = 0
    while (i < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var j = 0
        while (j < 8) { s += px(i * 8 + j) * PhashDct(v)(j); j += 1 }
        tmp(i * 8 + v) = s
        v += 1
      }
      i += 1
    }
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var k = 0
        while (k < 8) { s += PhashDct(u)(k) * tmp(k * 8 + v); k += 1 }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(f, 1, 64)
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var hash = 0L
    var k = 0
    while (k < 63) {
      if (ac(k) > med) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Companion-asset id offset and planting step of
    * [[phashAssetsFromDocuments]] — every `Step`-th doc gets a brightened
    * twin at id + Offset, giving the pair queries TRUE positives whose
    * discovery the oracle verifies. */
  val PhashCompanionOffset = 10000000L
  val PhashCompanionStep = 40L

  /** Rotated-companion id offset/step ([[orientedCompanionAssets]]): every
    * `Step`-th doc gets a TIFF twin stored under a non-trivial EXIF
    * orientation whose corrected decode restores the upright grid EXACTLY
    * (pure permutation, lossless container) — so each (base, rotated)
    * pair MUST pHash at Hamming 0 (r16 verdict missing #5). The offset
    * extends the 1e7/2e7/3e7 companion family (review finding: a 2e6
    * offset sat BELOW PhashCompanionOffset, so the `< 1e7` base-only
    * filters would have admitted rotated ids on corpora past 2e6 docs —
    * at 4e7 every existing filter excludes them on both sides). */
  val RotCompanionOffset = 40000000L
  val RotCompanionStep = 9L

  /** TIFF rotated companions of the pHash fixture: for every
    * [[RotCompanionStep]]-th BASE asset, decode the PNG, store the grid
    * under the INVERSE orientation permutation and tag the TIFF with the
    * forward one — a decoder that applies the Orientation tag recovers
    * the base pixels bit-exactly; one that ignores it hashes a rotated
    * grid and value-breaks the pair gate. Orientations cycle 2..8 so
    * every flip/transpose/rotation class is planted. Returns ONLY the
    * companions (union with the base at the call site). */
  def orientedCompanionAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaAsset].flatMap { a =>
      val rid = a.asset_id % DocIdStride
      if (rid % RotCompanionStep == 0 && rid < PhashCompanionOffset) {
        val (w, h, g) = PngCodec.decode(a.payload)
        val o = (rid / RotCompanionStep % 7 + 2).toInt // 2..8
        val (sw, sh, sg) =
          ExifCodec.orientGrid(w, h, g, ExifCodec.inverseOrientation(o))
        Seq(MediaAsset(a.asset_id + RotCompanionOffset, "tiff",
          TiffCodec.encode(sw, sh, sg, orientation = o), sw, sh, 1, 0))
      } else Nil
    }.toDF()
  }

  /** PNG asset table for the perceptual-hash family: every doc becomes the
    * same grayscale PNG as [[pngAssetsFromDocuments]]; every
    * [[PhashCompanionStep]]-th doc ADDITIONALLY yields a companion asset
    * (id + [[PhashCompanionOffset]]) whose pixels are all +16 — a global
    * brightness shift. The round trip is lossless and pHash is
    * brightness-invariant by construction (DC-only change), so each
    * (base, companion) pair MUST surface at Hamming 0: planted true
    * positives for [[DedupOps.bandedHammingPairs]], replayable by the
    * oracle from text + tiling arithmetic alone. */
  def phashAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fanOut(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        // same LOUD ASCII contract as the other codec fixtures (pixels +16
        // also relies on it: 127 + 16 < 256, no wraparound)
        require(text.forall(_ < 128),
          s"phash fixture requires ASCII text (doc $id)")
        // dims start at 8: a source narrower than the 8x8 sample grid
        // degenerates the hash (a 1-px-wide image upsamples to a constant
        // grid -> all-zero AC -> corpus-wide hash-0 cliques, measured 373k
        // pairs at sf0.1 before this floor; >= 8x8 keeps hashes text-driven
        // and the pair output linear in the planted companions)
        val w = (id % 24 + 8).toInt
        val h = (id % 16 + 8).toInt
        def gray(boost: Int) = Array.tabulate(w * h)(i =>
          ((if (text.isEmpty) 0 else text.charAt(i % text.length).toInt)
            + boost).toByte)
        val base = MediaAsset(id, "png",
          PngCodec.encode(w, h, gray(0), (id % 5).toInt), w, h, 1, 0)
        if (id % PhashCompanionStep == 0)
          Seq(base, MediaAsset(id + PhashCompanionOffset, "png",
            PngCodec.encode(w, h, gray(16), (id % 5).toInt), w, h, 1, 0))
        else Seq(base)
      }.toDF()
  }

  /** (asset_id, phash) over decodable image assets — decode and hash fuse
    * in one typed pass (the [[decodeFeatures]] shape: payload bytes never
    * leave the task, 16 bytes per image come out). PNG decodes the real
    * chunk walk to grayscale; BMP decodes RGB and reduces with the BT.601
    * integer luma (299r + 587g + 114b)/1000. Anything else fails loudly. */
  def imagePhash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("format"), col("asset_id"))
      .as[MediaAsset]
      .mapPartitions(_.map { a =>
        val (gray, w, h) = a.format match {
          case "png" =>
            val (pw, ph, g) = PngCodec.decode(a.payload)
            (g, pw, ph)
          case "jpeg" =>
            val (jw, jh, g) = JpegCodec.decodeGray(a.payload)
            (g, jw, jh)
          case "gif" =>
            val (gw, gh, g) = GifCodec.decode(a.payload)
            (g, gw, gh)
          case "tiff" =>
            // orientation-CORRECTED decode: the Orientation tag applies as
            // a grid permutation, so rotated twins hash like their base
            val (tw, th, g) = TiffCodec.decodeOriented(a.payload)
            (g, tw, th)
          case "bmp" =>
            val (bw, bh, rgb) = BmpCodec.decode(a.payload)
            val g = Array.tabulate(bw * bh) { p =>
              ((299 * (rgb(3 * p) & 0xff) + 587 * (rgb(3 * p + 1) & 0xff)
                + 114 * (rgb(3 * p + 2) & 0xff)) / 1000).toByte
            }
            (g, bw, bh)
          case f => throw new IllegalArgumentException(
            s"imagePhash needs bmp, png, gif or jpeg, got $f")
        }
        (a.asset_id, phash64(gray, w, h))
      })
      .toDF("asset_id", "phash")
  }
}
