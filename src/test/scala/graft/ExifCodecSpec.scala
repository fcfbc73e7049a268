package graft

import graft.ops.{ExifCodec, JpegCodec, MultimodalOps, PngCodec, TiffCodec}
import org.scalatest.funsuite.AnyFunSuite

/** EXIF/APP1 walk + orientation semantics (r16 verdict missing #5). */
class ExifCodecSpec extends AnyFunSuite {

  private val g = Array.tabulate(6 * 4)(i => (i * 11 + 3).toByte) // 6x4

  test("orientGrid: every inverse pair restores the grid bit-exactly") {
    (1 to 8).foreach { o =>
      val (sw, sh, sg) =
        ExifCodec.orientGrid(6, 4, g, ExifCodec.inverseOrientation(o))
      val (w2, h2, g2) = ExifCodec.orientGrid(sw, sh, sg, o)
      assert((w2, h2) == (6, 4), s"orientation $o dims")
      assert(g2.sameElements(g), s"orientation $o grid")
    }
    // spot-check a known permutation: 3 = rotate 180
    val (_, _, r) = ExifCodec.orientGrid(6, 4, g, 3)
    assert(r(0) == g(23) && r(23) == g(0))
    // 6 = rotate 90 CW: output is 4x6; upright (0,0) comes from stored
    // bottom-left (0, h-1)
    val (w6, h6, r6) = ExifCodec.orientGrid(6, 4, g, 6)
    assert((w6, h6) == (4, 6))
    assert(r6(0) == g(3 * 6 + 0))
  }

  test("APP1 round-trip in both byte orders; GPS presence; no-Exif None") {
    Seq(true, false).foreach { be =>
      val seg = ExifCodec.app1(orientation = 6,
        dateTime = "2021:07:04 08:30:00", make = "cam-3",
        gps = true, bigEndian = be)
      val jpeg = ExifCodec.insertApp1(
        JpegCodec.encodeGray(8, 8, new Array[Byte](64)), seg)
      val m = ExifCodec.scan(jpeg).get
      assert(m.orientation == 6 && m.dateTime == "2021:07:04 08:30:00" &&
        m.make == "cam-3" && m.hasGps &&
        m.byteOrder == (if (be) "MM" else "II"))
    }
    assert(ExifCodec.scan(JpegCodec.encodeGray(8, 8, new Array[Byte](64))).isEmpty)
    // a short Make (<= 4 bytes incl. NUL) stores inline
    val inl = ExifCodec.insertApp1(JpegCodec.encodeGray(8, 8, new Array[Byte](64)),
      ExifCodec.app1(2, "2021:07:04 08:30:00", "abc", gps = false,
        bigEndian = false))
    assert(ExifCodec.scan(inl).get.make == "abc")
  }

  test("stripExif removes APP1 but keeps pixels decodable and identical") {
    val pix = Array.tabulate(64)(i => (i * 4).toByte)
    val base = JpegCodec.encodeGray(8, 8, pix)
    val tagged = ExifCodec.insertApp1(base,
      ExifCodec.app1(3, "2021:07:04 08:30:00", "cam-1", gps = true,
        bigEndian = true))
    val stripped = ExifCodec.stripExif(tagged)
    assert(ExifCodec.scan(stripped).isEmpty)
    val (_, _, a) = JpegCodec.decodeGray(tagged)
    val (_, _, b) = JpegCodec.decodeGray(stripped)
    assert(a.sameElements(b))
    // stripping a file without Exif is the identity
    assert(ExifCodec.stripExif(base).sameElements(base))
  }

  test("TIFF orientation tag: decodeOriented restores the upright grid") {
    (2 to 8).foreach { o =>
      val (sw, sh, sg) =
        ExifCodec.orientGrid(6, 4, g, ExifCodec.inverseOrientation(o))
      val t = TiffCodec.encode(sw, sh, sg, orientation = o)
      // raw decode ignores orientation (stored order)...
      val (rw, rh, rg) = TiffCodec.decode(t)
      assert((rw, rh) == (sw, sh) && rg.sameElements(sg))
      // ...the corrected decode applies it
      val (cw, ch, cg) = TiffCodec.decodeOriented(t)
      assert((cw, ch) == (6, 4) && cg.sameElements(g), s"orientation $o")
    }
    // out-of-range orientation throws at both ends
    intercept[IllegalArgumentException] {
      TiffCodec.encode(6, 4, g, orientation = 9)
    }
  }

  test("rotated companions pHash-pair with their base at Hamming 0") {
    val spark = SparkTestBase.session
    import spark.implicits._
    val docs = Seq(
      (0L, "a quick brown fox jumps over the lazy dog repeatedly"),
      (9L, "pack my box with five dozen liquor jugs tonight maybe"),
      (18L, "sphinx of black quartz judge my vow says the typesetter"))
      .toDF("doc_id", "text")
    val base = MultimodalOps.phashAssetsFromDocuments(docs)
    val all = base.unionByName(MultimodalOps.orientedCompanionAssets(base))
    val ph = MultimodalOps.imagePhash(all)
      .as[(Long, Long)].collect().toMap
    Seq(0L, 9L, 18L).foreach { id =>
      assert(ph.contains(id + MultimodalOps.RotCompanionOffset), s"doc $id")
      assert(ph(id) == ph(id + MultimodalOps.RotCompanionOffset),
        s"doc $id rotated twin must hash identically")
    }
  }
}
