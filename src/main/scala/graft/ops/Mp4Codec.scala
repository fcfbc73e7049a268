package graft.ops

/** MP4 / ISO-BMFF (ISO 14496-12) CONTAINER AUDIT — the video sibling of
  * [[Mp3Codec]]'s header walk (r16 verdict missing #4: real crawled video
  * is MP4/H.264, not MJPEG-AVI). The repo's perceptual-codec stance is
  * unchanged — H.264/AAC DECODE stays out of scope — but a corpus audit
  * never decodes: it walks the BOX TREE (size+fourcc framing, nested
  * containers) and reads the rational metadata: `ftyp` brand, `mvhd`
  * timescale/duration, per-`trak` handler + `stsd` codec fourcc + `stts`
  * sample counts, `mdat` extent (skipped by size, including the 64-bit
  * largesize form). Pure public box arithmetic.
  *
  * Loud-failure contract: a box size under 8 (except the final size-0
  * to-EOF form), a box overrunning its parent, a truncated largesize, or
  * version>1 full-box headers in the read set all throw — an audit that
  * silently mis-walks a truncated file poisons duration statistics.
  *
  * Scale shape: one typed map per asset; the payload never reaches an
  * exchange (the PLANS codec-map invariant) and the walk is O(boxes),
  * not O(bytes) — `mdat` is skipped by size, never read. */
object Mp4Codec {

  final case class TrackMeta(handler: String, codec: String,
                             timescale: Long, samples: Long)
  final case class Mp4Scan(nTopBoxes: Long, brand: String, timescale: Long,
                           duration: Long, tracks: Seq[TrackMeta],
                           mdatBytes: Long)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"mp4: fourcc '$s'")
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** One box: 32-bit size + type + payload. */
  def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ fourcc(typ) ++ payload

  /** The 64-bit `largesize` form (size field = 1, 8-byte size follows). */
  def largeBox(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ fourcc(typ) ++ be64(payload.length + 16L) ++ payload

  private def fullBox(typ: String, version: Int,
                      payload: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](version.toByte, 0, 0, 0) ++ payload)

  /** Serialize a minimal conforming file: ftyp, optional free box, moov
    * (mvhd + one trak per TrackMeta with tkhd/mdia/mdhd/hdlr/minf/stbl/
    * stsd/stts — stts split into `sttsEntries` runs), and an mdat of
    * `mdatBytes` deterministic filler (largesize form iff `largeMdat`). */
  def encode(brand: String, timescale: Long, duration: Long,
             tracks: Seq[TrackMeta], mdatBytes: Int,
             planFree: Boolean, largeMdat: Boolean,
             sttsEntries: Int = 1): Array[Byte] = {
    val ftyp = box("ftyp", fourcc(brand) ++ be32(512) ++
      fourcc("isom") ++ fourcc("mp41"))
    val mvhd = fullBox("mvhd", 0,
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array[Byte](0x01, 0, 0, 0) ++
        new Array[Byte](8) ++ matrixBytes ++ new Array[Byte](24) ++
        be32(tracks.length + 1L))
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = fullBox("tkhd", 0,
        be32(0) ++ be32(0) ++ be32(i + 1L) ++ be32(0) ++ be32(duration) ++
          new Array[Byte](8) ++ new Array[Byte](8) ++ matrixBytes ++
          be32(if (t.handler == "vide") 640L << 16 else 0) ++
          be32(if (t.handler == "vide") 480L << 16 else 0))
      val mdhd = fullBox("mdhd", 0,
        be32(0) ++ be32(0) ++ be32(t.timescale) ++
          be32(t.samples * 100) ++ // media duration: fixture arithmetic
          Array(0x55.toByte, 0xc4.toByte) ++ Array[Byte](0, 0)) // 'und'
      val hdlr = fullBox("hdlr", 0,
        be32(0) ++ fourcc(t.handler) ++ new Array[Byte](12) ++
          Array[Byte](0))
      val entry = be32(16L) ++ fourcc(t.codec) ++ new Array[Byte](6) ++
        Array[Byte](0, 1)
      val stsd = fullBox("stsd", 0, be32(1L) ++ entry)
      // split the sample count over sttsEntries runs (delta varies per
      // run so a first-entry-only reader mis-sums)
      val runs = {
        val base = t.samples / sttsEntries
        val rem = t.samples - base * (sttsEntries - 1)
        (0 until sttsEntries).map { r =>
          val n = if (r == sttsEntries - 1) rem else base
          be32(n) ++ be32(1000L + r)
        }.reduce(_ ++ _)
      }
      val stts = fullBox("stts", 0, be32(sttsEntries.toLong) ++ runs)
      val stbl = box("stbl", stsd ++ stts)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.foldLeft(Array.emptyByteArray)(_ ++ _))
    val filler = Array.tabulate(mdatBytes)(i => ((i * 7 + 13) % 251).toByte)
    val mdat = if (largeMdat) largeBox("mdat", filler) else box("mdat", filler)
    val free = if (planFree) box("free", new Array[Byte](12))
               else Array.emptyByteArray
    ftyp ++ free ++ moov ++ mdat
  }

  private val matrixBytes: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  private def rd32(b: Array[Byte], p: Int): Long = {
    require(p + 4 <= b.length, s"mp4: truncated 32-bit read at $p")
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  }
  private def rd64(b: Array[Byte], p: Int): Long = {
    require(p + 8 <= b.length, s"mp4: truncated largesize at $p")
    (rd32(b, p) << 32) | rd32(b, p + 4)
  }
  private def typAt(b: Array[Byte], p: Int): String =
    new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (type, payloadStart, boxEnd) of the box at `p` within `end`. */
  private def boxHeader(b: Array[Byte], p: Int, end: Int): (String, Int, Int) = {
    require(p + 8 <= end, s"mp4: truncated box header at $p")
    val sz = rd32(b, p)
    val typ = typAt(b, p)
    val (bodyAt, boxEnd) =
      if (sz == 1) (p + 16L, p + rd64(b, p + 8)) // largesize spans the box
      else if (sz == 0) (p + 8L, end.toLong) // to end-of-enclosure
      else (p + 8L, p + sz)
    require(sz == 0 || sz == 1 || sz >= 8, s"mp4: box size $sz < 8 at $p")
    require(boxEnd <= end && bodyAt <= boxEnd,
      s"mp4: box '$typ' at $p overruns enclosure ($boxEnd > $end)")
    (typ, bodyAt.toInt, boxEnd.toInt)
  }

  /** Children (type, bodyStart, boxEnd) of the range [p, end). */
  private def children(b: Array[Byte], p0: Int, end: Int): Seq[(String, Int, Int)] = {
    var p = p0
    val out = Seq.newBuilder[(String, Int, Int)]
    while (p < end) {
      val h = boxHeader(b, p, end)
      out += h
      p = h._3
    }
    out.result()
  }

  private def child(cs: Seq[(String, Int, Int)], typ: String): (String, Int, Int) =
    cs.find(_._1 == typ).getOrElse(
      throw new IllegalArgumentException(s"mp4: missing required box '$typ'"))

  /** Box-tree audit. Never touches mdat bytes (skip by size). */
  def scan(payload: Array[Byte]): Mp4Scan = {
    val top = children(payload, 0, payload.length)
    val (_, ftypAt, _) = child(top, "ftyp")
    val brandStr = new String(payload, ftypAt, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    val (_, moovAt, moovEnd) = child(top, "moov")
    val moovKids = children(payload, moovAt, moovEnd)
    val (_, mvhdAt, _) = child(moovKids, "mvhd")
    val mvhdVer = payload(mvhdAt) & 0xff
    require(mvhdVer == 0, s"mp4: mvhd version $mvhdVer not supported")
    val timescale = rd32(payload, mvhdAt + 12)
    val duration = rd32(payload, mvhdAt + 16)
    val tracks = moovKids.filter(_._1 == "trak").map { case (_, tAt, tEnd) =>
      val tKids = children(payload, tAt, tEnd)
      val (_, mdiaAt, mdiaEnd) = child(tKids, "mdia")
      val mKids = children(payload, mdiaAt, mdiaEnd)
      val (_, mdhdAt, _) = child(mKids, "mdhd")
      require((payload(mdhdAt) & 0xff) == 0, "mp4: mdhd version != 0")
      val mTimescale = rd32(payload, mdhdAt + 12)
      val (_, hdlrAt, _) = child(mKids, "hdlr")
      val handler = new String(payload, hdlrAt + 8, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val (_, minfAt, minfEnd) = child(mKids, "minf")
      val (_, stblAt, stblEnd) = child(children(payload, minfAt, minfEnd), "stbl")
      val sKids = children(payload, stblAt, stblEnd)
      val (_, stsdAt, _) = child(sKids, "stsd")
      require(rd32(payload, stsdAt + 4) >= 1, "mp4: empty stsd")
      val codec = typAt(payload, stsdAt + 8) // first sample entry's fourcc
      val (_, sttsAt, sttsEnd) = child(sKids, "stts")
      val nEntries = rd32(payload, sttsAt + 4)
      require(sttsAt + 8 + nEntries * 8 <= sttsEnd,
        s"mp4: stts table overruns box ($nEntries entries)")
      var samples = 0L
      var e = 0
      while (e < nEntries) {
        samples += rd32(payload, sttsAt + 8 + e * 8)
        e += 1
      }
      TrackMeta(handler, codec, mTimescale, samples)
    }
    val mdatBytes = top.filter(_._1 == "mdat")
      .map { case (_, at, end) => (end - at).toLong }.sum
    Mp4Scan(top.length.toLong, brandStr, timescale, duration, tracks, mdatBytes)
  }
}
