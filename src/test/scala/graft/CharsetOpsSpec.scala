package graft

import graft.ops.{CharsetOps, MultimodalOps, WarcCodec}
import java.nio.charset.StandardCharsets.{UTF_8, ISO_8859_1}

/** Charset sniff + transcode (r16 verdict missing #1): WHATWG precedence
  * (BOM > transport header > meta prescan > UTF-8 default), strict REPORT
  * decode, and the WARC transport's legacy-charset legs. */
class CharsetOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val cp1252 = CharsetOps.Known("windows-1252")
  private val sjis = CharsetOps.Known("shift_jis")

  test("precedence: BOM beats header beats meta beats default") {
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    // BOM'd UTF-8 body with a LYING cp1252 header: the BOM must win
    val utf8Body = bom ++ "café".getBytes(UTF_8)
    assert(CharsetOps.decodeBody(utf8Body,
      Some("text/plain; charset=windows-1252")) == ("utf-8", "café"))
    // header wins over a lying meta tag
    val metaLies = ("<meta charset=shift_jis>café").getBytes(cp1252)
    assert(CharsetOps.decodeBody(metaLies,
      Some("text/html; charset=windows-1252"))._2 ==
      "<meta charset=shift_jis>café")
    // bare header -> the meta prescan decides
    val sjisBody =
      "<html><meta charset=shift_jis><body>日本</body>".getBytes(sjis)
    assert(CharsetOps.decodeBody(sjisBody, Some("text/html")) ==
      ("shift_jis", "<html><meta charset=shift_jis><body>日本</body>"))
    // legacy http-equiv form
    val equiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\">déjà").getBytes(cp1252)
    assert(CharsetOps.decodeBody(equiv, None)._2.endsWith("déjà"))
    // nothing declared -> UTF-8 default
    assert(CharsetOps.decodeBody("plain".getBytes(UTF_8), None) ==
      ("utf-8", "plain"))
    // UTF-16LE BOM
    val u16 = Array(0xFF.toByte, 0xFE.toByte) ++ "hi".getBytes("UTF-16LE")
    assert(CharsetOps.decodeBody(u16, None) == ("utf-16le", "hi"))
  }

  test("meta prescan stops at the 1024-byte window") {
    val pad = "x" * CharsetOps.MetaScanWindow
    val late = (pad + "<meta charset=windows-1252>").getBytes(ISO_8859_1)
    // declaration beyond the window is NOT seen -> default UTF-8 (all
    // ASCII here, so the decode itself succeeds)
    assert(CharsetOps.decodeBody(late, Some("text/html"))._1 == "utf-8")
  }

  test("loud throws: undecodable bytes, unknown labels — never U+FFFD") {
    // invalid UTF-8 under the default
    val bad = Array(0x61.toByte, 0xE9.toByte, 0x62.toByte)
    val e1 = intercept[IllegalArgumentException] {
      CharsetOps.decodeBody(bad, None)
    }
    assert(e1.getMessage.contains("undecodable"))
    // cp1252 has five unmapped holes (0x81 0x8D 0x8F 0x90 0x9D)
    val hole = Array(0x61.toByte, 0x81.toByte)
    intercept[IllegalArgumentException] {
      CharsetOps.decodeBody(hole, Some("text/plain; charset=windows-1252"))
    }
    // an unrecognized declared label throws rather than falling back
    val e3 = intercept[IllegalArgumentException] {
      CharsetOps.decodeBody("x".getBytes(UTF_8),
        Some("text/plain; charset=klingon"))
    }
    assert(e3.getMessage.contains("klingon"))
  }

  test("warc transport round-trips its legacy-charset legs losslessly") {
    // ASCII body (shift_jis-representable), cp1252-only chars, and chars
    // NEITHER legacy charset carries (the utf-8 fallback leg), across the
    // four id classes incl. the multi-part split (id % 5 == 0)
    val docs = Seq(
      (1L, "plain ascii body one"),        // %4=1 -> cp1252 declared
      (2L, "ascii for sjis here"),         // %4=2 -> shift_jis declared
      (3L, "bom utf8 leg body"),           // %4=3 -> BOM'd utf-8
      (4L, "undeclared default leg"),      // %4=0 -> plain utf-8
      (13L, "café déjà vu naïve"),         // %4=1, cp1252 carries accents
      (6L, "日本語 text ascii fails sjis roundtrip ​"), // %4=2 w/ ZWSP -> fallback
      (10L, "split across two responses because id mod five is zero")
    ).toDF("doc_id", "text")
    val got = MultimodalOps.warcTexts(
      MultimodalOps.warcAssetsFromDocuments(docs))
      .select("asset_id", "text").as[(Long, String)].collect().toMap
    val exp = docs.as[(Long, String)].collect().toMap
    assert(got == exp)
    // and the cp1252 leg genuinely shipped single-byte é (not UTF-8):
    // dig the raw response body out of doc 13's container (%5 != 0:
    // single response, so the whole body sits in one record)
    val payload = MultimodalOps.warcAssetsFromDocuments(docs)
      .filter($"asset_id" === 13L).select("payload")
      .as[Array[Byte]].head()
    val recs = WarcCodec.readRecords(graft.ops.GzipCodec.gunzip(payload))
    val ok = recs.filter(r => r.warcType == "response" &&
      WarcCodec.httpStatus(r.payload) == 200)
    val (body, cType) = WarcCodec.httpBodyAndContentType(ok.head.payload)
    assert(cType.exists(_.contains("windows-1252")))
    assert(body.sameElements("café déjà vu naïve".getBytes(cp1252)))
    assert(!body.sameElements("café déjà vu naïve".getBytes(UTF_8)))
  }

  test("http wire transports: chunked / gzip / chunked+gzip decode; framing is real") {
    val body = "chunked body with café and enough length to span chunks"
    // every (chunked, gzipped) combination round-trips to the same bytes
    for (ch <- Seq(false, true); gz <- Seq(false, true)) {
      val msg = WarcCodec.httpResponseEncoded(200, "OK",
        "text/plain; charset=utf-8", body.getBytes(UTF_8),
        chunked = ch, gzipped = gz)
      val (got, _) = WarcCodec.httpBodyAndContentType(msg)
      assert(got.sameElements(body.getBytes(UTF_8)), s"ch=$ch gz=$gz")
    }
    // the chunked wire form genuinely carries hex-size framing, an
    // extension and a trailer — i.e. skipping dechunk WOULD leak them
    val wire = new String(WarcCodec.httpResponseEncoded(200, "OK",
      "text/plain", body.getBytes(UTF_8), chunked = true, gzipped = false),
      ISO_8859_1)
    assert(wire.contains("Transfer-Encoding: chunked"))
    assert(!wire.contains("Content-Length"))
    assert(wire.contains("7;graft=1\r\n"))
    assert(wire.contains("X-Graft-Trailer: done"))
    // 7-byte chunks split the 2-byte UTF-8 é across a chunk boundary for
    // at least one alignment — prove the decoded text survives anyway
    val aligned = "aaaaaa" + "é" + "bbbbbb" // é bytes at offsets 6,7
    val msg2 = WarcCodec.httpResponseEncoded(200, "OK",
      "text/plain; charset=utf-8", aligned.getBytes(UTF_8),
      chunked = true, gzipped = false)
    assert(new String(WarcCodec.httpBodyAndContentType(msg2)._1, UTF_8) == aligned)
  }

  test("http wire transports: malformed framing throws loudly") {
    def msg(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n").getBytes(ISO_8859_1) ++ body
    // truncated chunk data
    val e1 = intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: chunked\r\n",
        "ff\r\nshort".getBytes(ISO_8859_1)))
    }
    assert(e1.getMessage.contains("overruns"))
    // non-hex size line
    intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: chunked\r\n",
        "zz\r\nabc\r\n0\r\n\r\n".getBytes(ISO_8859_1)))
    }
    // missing last-chunk terminator
    intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: chunked\r\n",
        "3\r\nabc\r\n".getBytes(ISO_8859_1)))
    }
    // chunk data not CRLF-terminated
    intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: chunked\r\n",
        "3\r\nabcXX0\r\n\r\n".getBytes(ISO_8859_1)))
    }
    // Transfer-Encoding + Content-Length = smuggling ambiguity
    val e5 = intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: chunked\r\nContent-Length: 3\r\n",
        "3\r\nabc\r\n0\r\n\r\n".getBytes(ISO_8859_1)))
    }
    assert(e5.getMessage.contains("ambiguous"))
    // unsupported codings throw rather than pass bytes through
    intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: gzip, chunked\r\n",
        "x".getBytes(ISO_8859_1)))
    }
    val e7 = intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Content-Encoding: deflate\r\nContent-Length: 1\r\n",
        "x".getBytes(ISO_8859_1)))
    }
    assert(e7.getMessage.contains("deflate"))
    // bytes after the trailer's empty line
    intercept[IllegalArgumentException] {
      WarcCodec.httpBodyAndContentType(msg(
        "Transfer-Encoding: chunked\r\n",
        "3\r\nabc\r\n0\r\n\r\nextra".getBytes(ISO_8859_1)))
    }
  }

  test("warc fixture transport legs: wire bytes carry the declared codings") {
    val docs = Seq.tabulate(8)(i => (i.toLong, s"body of document $i okay"))
      .toDF("doc_id", "text")
    val payloads = MultimodalOps.warcAssetsFromDocuments(docs)
      .select("asset_id", "payload").as[(Long, Array[Byte])].collect().toMap
    def resp200(id: Long): String = {
      val recs = WarcCodec.readRecords(graft.ops.GzipCodec.gunzip(payloads(id)))
      val ok = recs.filter(r => r.warcType == "response" &&
        WarcCodec.httpStatus(r.payload) == 200)
      new String(ok.head.payload, ISO_8859_1)
    }
    assert(!resp200(0L).contains("Transfer-Encoding")) // %7=0 identity
    assert(resp200(1L).contains("Transfer-Encoding: chunked") &&
      !resp200(1L).contains("Content-Encoding"))
    assert(resp200(2L).contains("Content-Encoding: gzip") &&
      !resp200(2L).contains("Transfer-Encoding"))
    assert(resp200(3L).contains("Transfer-Encoding: chunked") &&
      resp200(3L).contains("Content-Encoding: gzip"))
    // and the full reader still recovers every doc exactly
    val got = MultimodalOps.warcTexts(
      MultimodalOps.warcAssetsFromDocuments(docs))
      .select("asset_id", "text").as[(Long, String)].collect().toMap
    assert(got == docs.as[(Long, String)].collect().toMap)
  }

  test("wat link extraction: metadata envelope replays the planted edges") {
    val links = Seq(
      (0L, Seq(5L, 1L)),
      (1L, Seq(8L, 2L)),
      (2L, Seq(11L, 3L))).toDF("doc_id", "dsts")
    val got = MultimodalOps.watLinks(
      MultimodalOps.watAssetsFromDocuments(links))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 5L), (0L, 1L), (1L, 8L), (1L, 2L),
      (2L, 11L), (2L, 3L)))
    // the envelope is genuinely WAT-shaped: the JSON path exists and the
    // warcinfo record is type-filtered out (2 records, 1 metadata)
    val payload = MultimodalOps.watAssetsFromDocuments(links)
      .filter($"asset_id" === 0L).select("payload").as[Array[Byte]].head()
    val recs = WarcCodec.readRecords(graft.ops.GzipCodec.gunzip(payload))
    assert(recs.length == 2 && recs.count(_.warcType == "metadata") == 1)
    val json = new String(recs.find(_.warcType == "metadata").get.payload, UTF_8)
    assert(json.contains("\"HTML-Metadata\"") && json.contains("A@/href"))
  }

  test("httpAssets fixture: all five declaration shapes decode to the oracle text") {
    val docs = Seq.tabulate(10)(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    val got = MultimodalOps.httpTexts(MultimodalOps.httpAssetsFromDocuments(docs))
      .as[(Long, String, String)].collect().sortBy(_._1)
    got.foreach { case (id, charset, text) =>
      (id % 5) match {
        case 0 =>
          assert(charset == "utf-8" && text == s"doc body $id café")
        case 1 =>
          assert(charset == "windows-1252" && text == s"doc body $id café")
        case 2 =>
          assert(charset == "shift_jis" && text ==
            s"<html><head><meta charset=shift_jis></head><body>doc body $id 日本</body></html>")
        case 3 =>
          assert(charset == "iso-8859-1" && text == s"doc body $id ¼½")
        case _ =>
          assert(charset == "utf-8" && text == s"doc body $id")
      }
    }
  }
}
