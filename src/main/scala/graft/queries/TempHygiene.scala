package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Stale scratch-root cleanup for the dev mains. Engine queries build their
  * roots under `java.io.tmpdir` (one per invocation, by design — each write
  * bench starts from empty); across many Verify/Bench/test runs the leaked
  * directories accumulate into filesystem pressure that shows up as
  * bench-to-bench variance. Swept at harness startup only — never while a
  * session is using them — and only our own prefixes. */
object TempHygiene {
  private val Prefixes = Seq(
    "graft-engine-q-", "graft-engine-fx-", "graft-stage-", "graft-ckpt-",
    "graft-canon-", "graft-rstage-", "graft-rckpt-",
    // streaming-face lifecycle queries (session/rate/window/dedup staging,
    // checkpoint, and sink dirs) + persisted ANN quantizers. NOT a
    // "graft-" catch-all: GenScale writes its scaled datasets to
    // /tmp/graft-sf<N> and a catch-all would sweep them mid-experiment.
    "graft-sstage-", "graft-sckpt-", "graft-sout-",
    "graft-rtstage-", "graft-rtckpt-", "graft-rtout-",
    "graft-wstage-", "graft-wckpt-", "graft-wout-",
    "graft-ddstage-", "graft-ddckpt-", "graft-ddout-",
    "graft-dfstage-", "graft-dfckpt-", "graft-dfout-",
    "graft-slstage-", "graft-slckpt-", "graft-slout-",
    "graft-sjstage-", "graft-sjckpt-", "graft-sjout-",
    "graft-sdstage-", "graft-sdckpt-", "graft-sdout-",
    "graft-fnstage-", "graft-fnckpt-", "graft-fnout-",
    "graft-fwstage-", "graft-fwckpt-", "graft-fwout-",
    "graft-incidx-", // corpus band index, re-staged per JVM; oracle never reads it
    "graft-subidx-", // substring window-hash index, same staging contract
    "graft-lineidx-", // line-hash index, same staging contract
    "graft-mmstage-", // planted multimodal asset corpora, same staging contract
    "graft-mmsstage-", "graft-mmsckpt-", "graft-mmsout-", // streaming asset ingest face
    "graft-warcstage-", "graft-warcckpt-", "graft-warcout-", // streaming WARC ingest face
    "graft-zststage-", "graft-zstckpt-", "graft-zstout-", // streaming zstd ingest face
    // streaming incremental dedup (engine_stream_incremental): per-run
    // working index / stage / checkpoint / output, plus the per-JVM
    // epoch-form template
    "graft-incwork-", "graft-incstage-", "graft-incckpt-", "graft-incout-",
    "graft-incepoch-",
    "graft-bkt-", // bucketed-join staging tables (re-created per JVM)
    // NOT "graft-ivf-"/"graft-cluster-": the ANN quantizer dirs must outlive
    // the writing JVM until the driver's DuckDB oracle replay reads them
    // (SimilarityQueries invariant); the dead-PID + 24h reaper there bounds
    // their accumulation without racing the replay window.
    // test-suite scratch roots (stale from previous sbt test runs)
    "tsdb-test-", "soak-", "replay-tsdb-", "stream-ckpt-", "stream-src-",
    "stream-tsdb-", "roll-tsdb-", "roll-ckpt-", "refl-local-",
    "refl-remote-", "refl-src-", "refl-ckpt-")

  def sweep(): Unit = {
    val tmp = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    if (!Files.isDirectory(tmp)) return
    // age guard: only roots older than [[MinAgeMillis]] are stale. Without
    // it, two harnesses running concurrently (a dev subset-Verify next to
    // a full gate run) sweep each other's LIVE roots at startup — observed
    // r16: a parallel Verify deleted the gate's graft-incidx working index
    // mid-query. A single run finishes in minutes; 2 h is comfortably past
    // any live run and still bounds accumulation to one day's debris.
    val cutoff = System.currentTimeMillis() - MinAgeMillis
    val stream = Files.list(tmp)
    try stream.forEach { p =>
      val name = p.getFileName.toString
      if (Prefixes.exists(name.startsWith) &&
          (try Files.getLastModifiedTime(p).toMillis < cutoff
           catch { case _: Exception => false }))
        deleteRecursively(p)
    } finally stream.close()
  }

  /** Roots younger than this are presumed owned by a LIVE harness. */
  val MinAgeMillis: Long = 2L * 3600 * 1000

  private def deleteRecursively(root: Path): Unit =
    try {
      val walk = Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      finally walk.close()
    } catch { case _: Exception => () } // best-effort hygiene only
}
