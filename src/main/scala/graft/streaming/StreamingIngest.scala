package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.Tsdb

/** Structured Streaming ingest into the engine — the Spark replacement for
  * the reference's row WAL + commit machinery (src/libtsdb/wal.cc:248-347,
  * write.cc:36-447) per SURVEY.md §1.4/§7.2.7:
  *
  *  - the micro-batch checkpoint IS the WAL: a crash mid-batch replays that
  *    batch on restart (at-least-once delivery);
  *  - `Tsdb.writePoints`' bitwise idempotent tail-overwrite (reference
  *    wal.cc:87-246) turns the replay into a verified no-op, so storage is
  *    exactly-once without any sink-side transaction log;
  *  - a replayed batch whose bytes DIFFER from what was committed fails the
  *    write — the same corruption guard the reference's memcmp gives.
  *
  * Scale posture: each micro-batch appends bucket-partitioned sorted parquet
  * via the normal write path (no driver-side data movement); the per-series
  * dispatch loop is catalog-scale (series names only, never points).
  */
object StreamingIngest {

  /** The foreachBatch body, exposed for direct testing: validated append of
    * one (possibly multi-series) micro-batch. Series are fully independent
    * (reference doc/LOCKING.txt:3-8), so they are written CONCURRENTLY —
    * replay safety per series comes from the idempotent overwrite, not from
    * cross-series ordering. */
  def ingestBatch(tsdb: Tsdb, db: String, m: String, seriesCol: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    val seriesNames = batch.select(seriesCol).distinct()
      .collect().map(_.getString(0)).sorted // catalog-scale list, not points
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(seriesNames.toSeq.map { sn =>
      Future {
        tsdb.writePoints(db, m, sn,
          batch.filter(col(seriesCol) === sn).drop(seriesCol))
      }
    }), Duration.Inf)
  }

  /** Start streaming `points` (schema: seriesCol + time_ns + fields) into
    * `db`/`m`. `Trigger.AvailableNow()` drains what exists and terminates —
    * batch-incremental ingest; pass a processing-time trigger for continuous
    * tailing. */
  def start(tsdb: Tsdb, db: String, m: String, points: DataFrame,
            seriesCol: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    points.writeStream
      .queryName(s"graft-ingest-$db-$m")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(ingestBatch(tsdb, db, m, seriesCol) _)
      .start()
}
