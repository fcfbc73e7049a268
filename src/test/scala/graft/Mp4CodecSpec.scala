package graft

import graft.ops.Mp4Codec
import graft.ops.Mp4Codec.TrackMeta
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF audit walk (r16 verdict missing #4): box framing incl.
  * largesize, track/codec/sample census, and the loud-failure contract. */
class Mp4CodecSpec extends AnyFunSuite {

  private val vid = TrackMeta("vide", "avc1", 30000L, 24)
  private val aud = TrackMeta("soun", "mp4a", 48000L, 37)

  test("scan reads brand, duration, tracks, samples, mdat extent") {
    val f = Mp4Codec.encode("isom", 600, 1200, Seq(vid, aud),
      mdatBytes = 99, planFree = false, largeMdat = false)
    val s = Mp4Codec.scan(f)
    assert(s.nTopBoxes == 3) // ftyp moov mdat
    assert(s.brand == "isom" && s.timescale == 600 && s.duration == 1200)
    assert(s.tracks.map(t => (t.handler, t.codec, t.timescale, t.samples)) ==
      Seq(("vide", "avc1", 30000L, 24L), ("soun", "mp4a", 48000L, 37L)))
    assert(s.mdatBytes == 99)
  }

  test("free box is walked over; largesize mdat reports its true extent") {
    val f = Mp4Codec.encode("mp42", 600, 60, Seq(vid),
      mdatBytes = 1000, planFree = true, largeMdat = true)
    val s = Mp4Codec.scan(f)
    assert(s.nTopBoxes == 4) // ftyp free moov mdat
    assert(s.mdatBytes == 1000)
    // the largesize header is genuinely the 64-bit form: size field == 1
    val mdatAt = f.length - 1000 - 16
    assert((f(mdatAt) & 0xff) == 0 && (f(mdatAt + 3) & 0xff) == 1)
  }

  test("a two-entry stts sums across entries (first-entry-only mis-sums)") {
    val f = Mp4Codec.encode("isom", 600, 60, Seq(vid.copy(samples = 25)),
      mdatBytes = 8, planFree = false, largeMdat = false, sttsEntries = 2)
    assert(Mp4Codec.scan(f).tracks.head.samples == 25)
  }

  test("loud throws: truncation, overrun, missing boxes") {
    val f = Mp4Codec.encode("isom", 600, 60, Seq(vid),
      mdatBytes = 40, planFree = false, largeMdat = false)
    // truncated mid-box: the final mdat loses bytes -> its size overruns
    intercept[IllegalArgumentException] {
      Mp4Codec.scan(f.dropRight(10))
    }
    // a box size below 8 (and not 0/1)
    val bad = f.clone()
    bad(3) = 5 // ftyp size -> 5
    intercept[IllegalArgumentException] { Mp4Codec.scan(bad) }
    // missing moov: keep only ftyp
    val ftypLen = ((f(0) & 0xff) << 24) | ((f(1) & 0xff) << 16) |
      ((f(2) & 0xff) << 8) | (f(3) & 0xff)
    val e = intercept[IllegalArgumentException] {
      Mp4Codec.scan(f.take(ftypLen))
    }
    assert(e.getMessage.contains("moov"))
  }
}
