package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.engine.{MeasurementSchema, Tsdb}

/** CONTINUOUS AGGREGATION: maintain a downsampled rollup measurement from a
  * live point stream — the streaming face of `Tsdb.downsample` (the batch
  * rollup workflow, reference clients' zoom tables) and the engine analog
  * of TimescaleDB continuous aggregates / InfluxDB tasks.
  *
  * Pipeline: watermarked tumbling windows (`StreamingOps.windowedSums`,
  * Append mode — a window emits exactly once, when the watermark passes its
  * end) → one validated multi-series `writeBatch` per micro-batch into the
  * rollup measurement. Exactly-once composes the same way ingest does: a
  * replayed micro-batch re-emits the identical finalized windows, and the
  * engine's bitwise idempotent tail overwrite verifies them into a no-op.
  * Window starts are strictly increasing per series across batches (the
  * watermark is monotone), so the engine's append-only rule is satisfied
  * by construction; late points beyond the watermark are dropped by the
  * aggregation and can never un-finalize a written window.
  *
  * Scale posture: one shuffle on (series, window), O(1) state per open
  * window bounded by the watermark horizon, and a fixed number of write
  * jobs per micro-batch whatever the series count.
  */
object StreamingRollup {

  /** The rollup contract shared with `Tsdb.downsample` (`engine.Rollups`);
    * the stream schema's value field is `v`. */
  def rollupMeasurement(m: String, windowUs: Long): String =
    graft.engine.Rollups.name(m, "v", windowUs)

  /** Start the continuous aggregation of `points` (schema: `series`,
    * `time_us`, `v`) into `db`/`rollupMeasurement(m, windowUs)`. The
    * database must exist; the rollup measurement is created idempotently.
    * @return the running query; the rollup is readable through the normal
    *         engine surface (`select`/`sumWindows`/...) as it fills. */
  def start(tsdb: Tsdb, db: String, m: String, points: DataFrame,
            windowUs: Long, watermarkUs: Long, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val rollup = rollupMeasurement(m, windowUs)
    tsdb.createMeasurement(db, rollup, graft.engine.Rollups.Schema)
    // same aggregates as StreamingOps.windowedSums, but the sum uses the
    // engine's order-independent decimal-2 accumulation (incremental
    // streaming state merges in arbitrary order; a double sum would drift
    // from the batch `downsample` of the same points)
    points
      .withColumn("event_time", timestamp_micros(col("time_us")))
      .withWatermark("event_time", s"$watermarkUs microseconds")
      .groupBy(col("series"),
        window(col("event_time"), s"$windowUs microseconds"))
      .agg(graft.ops.TimeSeriesOps.sumExact2(col("v")).as("sum_value"),
        min("v").as("min_value"), max("v").as("max_value"),
        count("v").as("n"))
      .select(col("series"),
        unix_micros(col("window.start")).as(MeasurementSchema.TimeCol),
        col("sum_value"), col("min_value"), col("max_value"), col("n"))
      .writeStream
      .queryName(s"graft-rollup-$db-$rollup")
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // writeBatch runs several actions (stats, overlap verify, write) —
        // each would RE-EXECUTE the stateful window aggregation including
        // its state-store access without a materialization barrier here
        val pinned = batch.persist()
        try tsdb.writeBatch(db, rollup, pinned): Unit
        finally pinned.unpersist(): Unit
      }
      .start()
  }
}
