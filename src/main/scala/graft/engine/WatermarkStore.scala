package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The measurement's watermark TABLE — one log-structured store holding the
  * `[time_first, time_last]` range of EVERY series, replacing the r1-r5
  * design of one JSON file per series (reference analog: per-series
  * `time_first`/`time_last` files, src/libtsdb/series.cc:56-72 — fine
  * single-node, but a cluster catalog with 10⁶ series cannot list 10⁶
  * objects per query).
  *
  * Layout under `<measurement>/_wm/`:
  * {{{
  *   snap-<v>-<uuid>.jsonl    full table at version v (one line per series)
  *   delta-<v>-<uuid>.jsonl   the series updated by ONE write, at version v
  * }}}
  *
  * Every mutation appends ONE delta file (atomic tmp+rename) regardless of
  * how many series it touches — a micro-batch updating 10⁴ series costs one
  * small object, not 10⁴. Readers list the directory (bounded: one snapshot
  * + at most [[WatermarkStore.CompactThreshold]] deltas), take the latest
  * snapshot, and apply the deltas with version >= snapshot version in
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
  * harmless). Compactions are collision-free for TWO concurrent writers:
  * snapshots carry uuid-distinct names (no rename-overwrite can drop a
  * commit), readers merge all snapshots at the newest version, and a delta
  * committed concurrently with a compaction (same version as the snapshot,
  * unlisted by the compactor so it survives the delete) stays live via the
  * >= filter. The residual hazard needs ≥3 interleaved writers inside one
  * update's window (a delta whose version lands strictly below a snapshot
  * it was not merged into). Deployments needing stronger guarantees should
  * back this table with a transactional store; the format isolates that
  * swap to this class.
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
    /** Snapshots AT the newest snapshot version, in name order — two
      * concurrent compactions produce two uuid-distinct snapshots with the
      * same version, each holding the common base plus its own writer's
      * entries; merging them (different-series writes commute under the
      * single-writer-per-series contract) loses neither. */
    def liveSnaps: Seq[Path] = snaps.filter(_._1 == snapVersion).map(_._2)
    /** Deltas not subsumed by the newest snapshot, in (version, name)
      * order. `>=` not `>`: a delta committed CONCURRENTLY with a
      * compaction carries the same version as the snapshot (both writers
      * computed maxVersion+1) but its content is not in it — it survives
      * the compactor's delete (unlisted) and must still apply. */
    def liveDeltas: Seq[(Long, Path)] = deltas.filter(_._1 >= snapVersion)
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
        }).sortBy { case (v, p) => (v, p.getName) },
        paths.flatMap(p => p.getName match {
          case DeltaRe(v, _) => Some(v.toLong -> p); case _ => None
        }).sortBy { case (v, p) => (v, p.getName) })
    }
  }

  private def decode(l: Listing): Map[String, SeriesRange] = {
    val base = l.liveSnaps.foldLeft(Map.empty[String, SeriesRange])(
      (acc, s) => acc ++ parseLines(readString(s)))
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
      // uuid-distinct name: two concurrent compactions at the same version
      // both SURVIVE (no rename-overwrite losing one writer's commit) and
      // readers merge them via liveSnaps
      val snap = new Path(dir,
        f"snap-$v%016d-${java.util.UUID.randomUUID.toString.take(8)}%s.jsonl")
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

  private def readString(p: Path): String = StorageIO.readString(p, hconf)

  private def atomicWrite(p: Path, content: String): Unit =
    StorageIO.atomicWrite(p, content, hconf)
}

object WatermarkStore {
  /** Live-delta count that triggers folding into a fresh snapshot. */
  val CompactThreshold = 64

  private val SnapRe = """snap-(\d{16})(?:-[0-9a-f]{8})?\.jsonl""".r
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
