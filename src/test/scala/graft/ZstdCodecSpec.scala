package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ZstdCodec

/** RFC 8878 codec gate. Three legs:
  *
  *  1. round-trip: our encoder → our decoder, across the block-type and
  *     literal-type matrix (RLE runs, huffman-friendly text, high-byte
  *     UTF-8 that forces raw literals, multi-block, multi-frame,
  *     skippables, empty);
  *  2. interop OUT: our encoder's bytes must decode through the REFERENCE
  *     implementation (zstd-jni, libzstd — test-only dependency from the
  *     Spark classpath), which also verifies our XXH64 content checksum;
  *  3. interop IN: libzstd's own output — which uses 4-stream literals,
  *     FSE-compressed tables, repeat offsets, treeless literals and
  *     windowed (non-single-segment) frames — must decode through OUR
  *     decoder, value-exact.
  *
  * Plus the loud-failure matrix: corruption anywhere throws, never
  * truncates. */
class ZstdCodecSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Deterministic pseudo-text: repetitive enough to produce matches,
    * varied enough to exercise huffman. */
  private def corpus(n: Int): Array[Byte] = {
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dogs", "pack", "my", "box", "with", "five", "dozen",
      "liquor", "jugs")
    val sb = new StringBuilder
    var i = 0
    while (sb.length < n) { sb.append(words(i % words.length)).append(' '); i += 1 }
    utf8(sb.substring(0, n))
  }

  private val samples: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one byte" -> Array('x'.toByte),
    "short" -> utf8("hello zstd"),
    "rle run" -> Array.fill(500)('z'.toByte),
    "text 1k" -> corpus(1000),
    "text multiblock" -> corpus(7000),
    "high bytes" -> utf8("Café — naïve résumé " * 40),
    "binary-ish" -> Array.tabulate(3000)(i => ((i * 31 + i / 7) % 251).toByte),
    "repeat heavy" -> utf8(("abcdefgh" * 64 + "XYZ") * 8),
    // match-poor word soup: forces the COMPRESSED-literals path (huffman
    // direct-weight table + 1-stream) instead of raw literals — the
    // encoder-header bug class the tar.zst fixture caught lives here
    "word soup" -> {
      val w = Array("spark", "group", "query", "row", "data", "slow",
        "small", "filter", "customer", "line", "the", "batch", "value")
      val sb = new StringBuilder
      var i = 0
      while (i < 120) { sb.append(w((i * 7 + i * i % 11) % w.length)).append(' '); i += 1 }
      utf8(sb.toString)
    }
  )

  test("huffman-literals path is genuinely exercised by the sample matrix") {
    val soup = samples.find(_._1 == "word soup").get._2
    val enc = ZstdCodec.zstd(soup)
    // raw literals would leave the frame near input size; the huffman
    // path compresses word soup well below 80%
    assert(enc.length < soup.length * 4 / 5,
      s"word soup ${soup.length} -> ${enc.length}: huffman literals dead")
    assert(ZstdCodec.decode(enc).bytes.sameElements(soup))
  }

  test("round-trip: own encoder through own decoder, whole sample matrix") {
    samples.foreach { case (name, data) =>
      val enc = ZstdCodec.zstd(data)
      val dec = ZstdCodec.decode(enc)
      assert(dec.bytes.sameElements(data), s"$name round-trip")
      assert(dec.nFrames == 1 && dec.nSkippable == 0, s"$name accounting")
    }
  }

  test("compression actually happens on compressible input") {
    val data = corpus(7000)
    val enc = ZstdCodec.zstd(data)
    assert(enc.length < data.length / 2,
      s"7000 compressible bytes became ${enc.length} (matcher or huffman dead)")
  }

  test("multi-frame + skippable frames decode whole, with accounting") {
    val a = corpus(900); val b = utf8("tail frame")
    val payload = ZstdCodec.zstd(a) ++
      ZstdCodec.skippableFrame(utf8("ignore me")) ++ ZstdCodec.zstd(b)
    val dec = ZstdCodec.decode(payload)
    assert(dec.bytes.sameElements(a ++ b))
    assert(dec.nFrames == 2 && dec.nSkippable == 1)
  }

  test("interop OUT: libzstd decodes our frames (checksum verified by libzstd)") {
    samples.foreach { case (name, data) =>
      val enc = ZstdCodec.zstd(data)
      val got = com.github.luben.zstd.Zstd.decompress(enc, math.max(data.length, 1))
      assert(got.sameElements(data), s"$name via libzstd")
    }
  }

  test("interop IN: our decoder handles libzstd output across levels") {
    // levels span fast (repcode-heavy) to max (FSE-compressed tables,
    // 4-stream literals on the bigger inputs); non-single-segment frames
    // exercise the window-descriptor path
    val inputs = samples.map(_._2) :+ corpus(60000) :+
      utf8("aaaaaaaaaabbbbbbbbbb" * 800) // repcode bait
    for (data <- inputs; level <- Seq(1, 3, 9, 19)) {
      val enc = com.github.luben.zstd.Zstd.compress(data, level)
      val dec = ZstdCodec.decode(enc)
      assert(dec.bytes.sameElements(data), s"level $level len ${data.length}")
    }
  }

  test("interop IN: libzstd WITH checksum flag set") {
    val data = corpus(5000)
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(6)
      ctx.setChecksum(true)
      val enc = ctx.compress(data)
      assert(ZstdCodec.decode(enc).bytes.sameElements(data))
      // and a flipped content byte must fail the checksum, not pass silently
      // (flip near the end of the compressed body, before the 4 checksum
      // bytes — some flips break framing first, which also throws)
      val bad = enc.clone()
      bad(enc.length - 5) = (bad(enc.length - 5) ^ 1).toByte
      intercept[IllegalArgumentException](ZstdCodec.decode(bad))
    } finally ctx.close()
  }

  test("xxh64 matches the reference vectors") {
    assert(ZstdCodec.xxh64(Array.emptyByteArray, 0, 0) == 0xEF46DB3751D8E999L)
    // cross-check every sample against libzstd's bundled xxhash
    samples.foreach { case (name, data) =>
      // zstd-jni doesn't expose xxh64 directly; the checksum interop test
      // above covers it end-to-end. Here: self-consistency across offsets.
      val padded = Array.fill(3)(0x55.toByte) ++ data
      assert(ZstdCodec.xxh64(padded, 3, data.length) ==
        ZstdCodec.xxh64(data, 0, data.length), s"$name offset independence")
    }
  }

  test("loud failures: corruption throws, never truncates") {
    val data = corpus(2500)
    val enc = ZstdCodec.zstd(data)
    // bad magic
    val badMagic = enc.clone(); badMagic(0) = 0
    intercept[IllegalArgumentException](ZstdCodec.decode(badMagic))
    // truncated tail (checksum cut)
    intercept[IllegalArgumentException](ZstdCodec.decode(enc.dropRight(2)))
    // trailing garbage after a valid frame
    intercept[IllegalArgumentException](
      ZstdCodec.decode(enc ++ Array[Byte](1, 2, 3)))
    // corrupt second frame of a multi-frame stream: must THROW, not
    // return the first frame (the GzipCodec silent-truncation trap)
    val two = ZstdCodec.zstd(data) ++ ZstdCodec.zstd(data)
    val cut = two.take(enc.length + 6)
    intercept[IllegalArgumentException](ZstdCodec.decode(cut))
    // dictionary id set
    val dict = enc.clone(); dict(4) = (dict(4) | 0x01).toByte
    intercept[IllegalArgumentException](ZstdCodec.decode(dict))
    // reserved FHD bit
    val res = enc.clone(); res(4) = (res(4) | 0x08).toByte
    intercept[IllegalArgumentException](ZstdCodec.decode(res))
    // checksum mismatch (flip a checksum byte itself)
    val ck = enc.clone(); ck(enc.length - 1) = (ck(enc.length - 1) ^ 0x40).toByte
    intercept[IllegalArgumentException](ZstdCodec.decode(ck))
    // empty payload
    intercept[IllegalArgumentException](ZstdCodec.decode(Array.emptyByteArray))
  }

  test("decoder consistency: every encoder block type appears across samples") {
    // proves the fixture matrix actually exercises Compressed, Raw-inside
    // and RLE blocks (block type is bits [2:1] of the 3-byte header after
    // the frame header; rather than re-parse, assert via behavior:)
    val rle = ZstdCodec.zstd(Array.fill(400)('q'.toByte))
    assert(rle.length < 30, "constant run must collapse to an RLE block")
    val incompressible = {
      // xxh64 chain: uniform pseudo-random bytes, no periodicity
      val out = new Array[Byte](300)
      var state = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < out.length) {
        val b = new Array[Byte](8)
        var k = 0
        while (k < 8) { b(k) = (state >>> (8 * k)).toByte; k += 1 }
        state = ZstdCodec.xxh64(b, 0, 8)
        out(i) = state.toByte
        i += 1
      }
      out
    }
    val raw = ZstdCodec.zstd(incompressible)
    assert(raw.length >= incompressible.length,
      "incompressible input must ship as a raw block (plus framing)")
    val dec = ZstdCodec.decode(raw)
    assert(dec.bytes.sameElements(incompressible))
  }
}
