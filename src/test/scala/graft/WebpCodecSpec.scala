package graft

import graft.ops.WebpCodec
import org.scalatest.funsuite.AnyFunSuite

/** VP8L from-scratch codec (r16 verdict missing #2): container walk,
  * prefix-code forms, LZ77 runs, color cache, subtract-green — all legs
  * via exact round-trips plus the loud-failure contract. */
class WebpCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def rt(w: Int, h: Int, px: Array[Int], sg: Boolean, cb: Int): Unit = {
    val enc = WebpCodec.encode(w, h, px, subtractGreen = sg, cacheBits = cb)
    val (w2, h2, got) = WebpCodec.decode(enc)
    assert((w2, h2) == (w, h), s"dims sg=$sg cb=$cb")
    assert(got.sameElements(px), s"pixels sg=$sg cb=$cb")
  }

  test("round-trips across transform x cache combos and image shapes") {
    // varied content: full-alpha photo-ish gradient (normal codes on all
    // channels), repeated rows (distance-1 runs), few distinct colors
    // (cache hits), single-color (one literal + one giant run)
    val shapes = Seq(
      (13, 7, img(13, 7)((x, y) => (0xff << 24) | ((x * 19 + y) % 256 << 16) |
        ((x * 7 + y * 3) % 256 << 8) | ((x + y * 11) % 256))),
      (16, 16, img(16, 16)((x, _) => (0xff << 24) | (40 << 16) |
        ((x % 4) * 60 << 8) | 200)), // rows identical -> long runs
      (9, 5, img(9, 5)((x, y) => if ((x + y) % 2 == 0) 0xff102030
        else 0xffa0b0c0)), // two colors alternating: cache-heavy
      (1, 1, Array(0xff000000)),
      (40, 1, Array.fill(40)(0x80334455)) // non-255 alpha, constant
    )
    for ((w, h, px) <- shapes; sg <- Seq(false, true); cb <- Seq(0, 4, 6))
      rt(w, h, px, sg, cb)
  }

  test("cache-only green tree round-trips (review finding: single >255 symbol)") {
    // all-zero pixels with the cache on: the zero-initialized cache hits
    // on the very first pixel, so EVERY token is cache code 280 — the
    // green tree's only used symbol can't take the simple form (> 255)
    // and its normal-form header makes the decoder walk one bit per
    // symbol, which the emitter must actually write
    rt(2, 2, Array.fill(4)(0x00000000), sg = false, cb = 6)
    rt(3, 1, Array.fill(3)(0x00000000), sg = true, cb = 4)
  }

  test("deterministic pseudo-noise image round-trips (normal-code stress)") {
    // LCG noise: every channel exercises deep Huffman tables, no runs
    var s = 12345
    def nxt(): Int = { s = s * 1103515245 + 12345; (s >>> 8) & 0xff }
    val px = Array.fill(31 * 17)((0xff << 24) | (nxt() << 16) | (nxt() << 8) | nxt())
    rt(31, 17, px, sg = false, cb = 0)
    rt(31, 17, px, sg = true, cb = 8)
  }

  test("the stream genuinely contains VP8L machinery, not a passthrough") {
    val runs = img(32, 32)((_, y) => (0xff << 24) | (y % 3 * 80 << 8))
    val enc = WebpCodec.encode(32, 32, runs, subtractGreen = false, cacheBits = 4)
    // container framing
    assert(new String(enc, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(enc, 8, 4, "US-ASCII") == "WEBP")
    assert(new String(enc, 12, 4, "US-ASCII") == "VP8L")
    // 1024 argb pixels = 4096 bytes raw; runs + cache must beat that by far
    assert(enc.length < 400, s"compression absent: ${enc.length} bytes")
  }

  test("loud throws: lossy chunk, bad magic, truncation, bad signature") {
    val ok = WebpCodec.encode(4, 4, Array.fill(16)(0xff112233))
    val lossy = ok.clone()
    lossy(12) = 'V'; lossy(13) = 'P'; lossy(14) = '8'; lossy(15) = ' '
    val e = intercept[IllegalArgumentException] { WebpCodec.decode(lossy) }
    assert(e.getMessage.contains("VP8L only"))
    val notRiff = ok.clone(); notRiff(0) = 'X'
    intercept[IllegalArgumentException] { WebpCodec.decode(notRiff) }
    intercept[IllegalArgumentException] { WebpCodec.decode(ok.take(24)) }
    val badSig = ok.clone(); badSig(20) = 0x11
    intercept[IllegalArgumentException] { WebpCodec.decode(badSig) }
  }
}
