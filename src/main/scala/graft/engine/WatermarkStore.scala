package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import java.nio.charset.StandardCharsets

/** The measurement's watermark TABLE — one log-structured store holding the
  * `[time_first, time_last]` range of EVERY series, replacing the r1-r5
  * design of one JSON file per series (reference analog: per-series
  * `time_first`/`time_last` files, src/libtsdb/series.cc:56-72 — fine
  * single-node, but a cluster catalog with 10⁶ series cannot list 10⁶
  * objects per query).
  *
  * Layout under `<measurement>/_wm/`:
  * {{{
  *   snap-<v>.jsonl           full table at version v (one line per series)
  *   delta-<v>-<uuid>.jsonl   the series updated by ONE write, at version v
  * }}}
  *
  * Every mutation appends ONE delta file (atomic tmp+rename) regardless of
  * how many series it touches — a micro-batch updating 10⁴ series costs one
  * small object, not 10⁴. Readers list the directory (bounded: one snapshot
  * + at most [[WatermarkStore.CompactThreshold]] deltas), take the latest
  * snapshot, and apply the deltas with version > snapshot version in
  * version order — latest entry per series wins. When the delta count
  * crosses the threshold, the writing update folds everything into a fresh
  * snapshot and deletes the merged files, so the directory listing stays
  * O(1) no matter how many updates ever ran.
  *
  * Caching: the decoded table is cached per store instance, keyed by the
  * directory's file-name signature — a repeat load costs one `listStatus`
  * (no file reads), and a load after a foreign update re-reads only because
  * the signature changed. The driver-side map is catalog-scale (tens of
  * bytes per series).
  *
  * Concurrency contract — the same one the data path already has
  * (single writer per series; the reference serializes with flocks,
  * series.h:42-179, which object stores don't offer): concurrent updates to
  * DIFFERENT series are safe (distinct delta files; latest-wins is
  * per-series, and a version-number tie between different series is
  * harmless). The one hazard is a compaction racing a concurrent writer
  * whose delta landed after the compactor listed the directory AND reused a
  * version ≤ the new snapshot's — which needs ≥3 interleaved writers inside
  * one update's window. Deployments needing stronger guarantees should back
  * this table with a transactional store; the format isolates that swap to
  * this class.
  */
final class WatermarkStore(dir: Path, hconf: Configuration) {
  import WatermarkStore._

  private def fs: FileSystem = dir.getFileSystem(hconf)

  /** (file-name signature, decoded table) of the last load. */
  private var cached: Option[(Seq[String], Map[String, SeriesRange])] = None

  private case class Listing(snaps: Seq[(Long, Path)], deltas: Seq[(Long, Path)]) {
    def signature: Seq[String] =
      (snaps.map(_._2.getName) ++ deltas.map(_._2.getName)).sorted
    def maxVersion: Long =
      (snaps.map(_._1) ++ deltas.map(_._1)).foldLeft(0L)(math.max)
    def snapVersion: Long = snaps.lastOption.map(_._1).getOrElse(-1L)
    /** Deltas newer than the latest snapshot, in (version, name) order. */
    def liveDeltas: Seq[(Long, Path)] = deltas.filter(_._1 > snapVersion)
  }

  private def list(): Listing = {
    val f = fs
    if (!f.exists(dir)) Listing(Nil, Nil)
    else {
      val paths = f.listStatus(dir).toSeq.map(_.getPath)
        .filterNot(_.getName.startsWith("."))
      Listing(
        paths.flatMap(p => p.getName match {
          case SnapRe(v) => Some(v.toLong -> p); case _ => None
        }).sortBy(_._1),
        paths.flatMap(p => p.getName match {
          case DeltaRe(v, _) => Some(v.toLong -> p); case _ => None
        }).sortBy { case (v, p) => (v, p.getName) })
    }
  }

  private def decode(l: Listing): Map[String, SeriesRange] = {
    val base = l.snaps.lastOption
      .map(s => parseLines(readString(s._2))).getOrElse(Map.empty[String, SeriesRange])
    l.liveDeltas.foldLeft(base)((acc, d) => acc ++ parseLines(readString(d._2)))
  }

  private def loadFrom(l: Listing): Map[String, SeriesRange] = {
    val sig = l.signature
    cached match {
      case Some((s, m)) if s == sig => m
      case _ =>
        val m = decode(l)
        cached = Some((sig, m))
        m
    }
  }

  /** The full table. One `listStatus` when nothing changed. */
  def load(): Map[String, SeriesRange] = synchronized { loadFrom(list()) }

  def get(series: String): Option[SeriesRange] = load().get(series)

  /** Commit the given per-series ranges: ONE atomic delta file (or, past the
    * threshold, one folded snapshot), whatever the batch size. */
  def update(entries: Map[String, SeriesRange]): Unit = synchronized {
    if (entries.isEmpty) return
    val l = list()
    val merged = loadFrom(l) ++ entries
    val v = l.maxVersion + 1
    if (l.liveDeltas.size + 1 > CompactThreshold) {
      val snap = new Path(dir, f"snap-$v%016d.jsonl")
      atomicWrite(snap, encodeLines(merged))
      // everything the new snapshot subsumes goes away; the listing stays
      // one snapshot + the (few) deltas other writers may have just added
      (l.snaps.map(_._2) ++ l.deltas.map(_._2)).foreach(p => fs.delete(p, false))
      cached = Some((Seq(snap.getName), merged))
    } else {
      val delta = new Path(dir,
        f"delta-$v%016d-${java.util.UUID.randomUUID.toString.take(8)}%s.jsonl")
      atomicWrite(delta, encodeLines(entries))
      cached = Some(((l.signature :+ delta.getName).sorted, merged))
    }
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def atomicWrite(p: Path, content: String): Unit = {
    val f = fs
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val fc = FileContext.getFileContext(p.toUri, hconf)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }
}

object WatermarkStore {
  /** Live-delta count that triggers folding into a fresh snapshot. */
  val CompactThreshold = 64

  private val SnapRe = """snap-(\d{16})\.jsonl""".r
  private val DeltaRe = """delta-(\d{16})-([0-9a-f]{8})\.jsonl""".r
  private val LineRe =
    """\{"series":"([A-Za-z0-9_.-]+)","time_first":(-?\d+),"time_last":(-?\d+)\}""".r

  private[engine] def encodeLines(m: Map[String, SeriesRange]): String =
    m.toSeq.sortBy(_._1).map { case (s, r) =>
      s"""{"series":"$s","time_first":${r.timeFirst},"time_last":${r.timeLast}}"""
    }.mkString("", "\n", "\n")

  private[engine] def parseLines(s: String): Map[String, SeriesRange] =
    s.linesIterator.filter(_.nonEmpty).map {
      case LineRe(name, tf, tl) => name -> SeriesRange(tf.toLong, tl.toLong)
      case other => throw new InvalidSchemaException(s"corrupt watermark line: $other")
    }.toMap
}
