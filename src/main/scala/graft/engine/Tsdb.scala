package graft.engine

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions
import graft.ops.TimeSeriesOps

import java.nio.charset.StandardCharsets

/** Live range of a series. `timeFirst` is the delete watermark (points below
  * it are invisible and silently discarded on write); `timeLast` is the
  * append high-watermark (reference `time_first`/`time_last` files,
  * src/libtsdb/series.cc:56-72, doc/LOCKING.txt:58-76). */
final case class SeriesRange(timeFirst: Long, timeLast: Long) {
  def toJson: String = s"""{"version":1,"time_first":$timeFirst,"time_last":$timeLast}"""
}
object SeriesRange {
  private val Re = """\{"version":1,"time_first":(-?\d+),"time_last":(-?\d+)\}""".r
  def fromJson(s: String): SeriesRange = s.trim match {
    case Re(a, b) => SeriesRange(a.toLong, b.toLong)
    case _        => throw new InvalidSchemaException(s"corrupt watermark json: $s")
  }
}

final case class WriteResult(written: Long, discarded: Long, overwriteVerified: Long)

/** The engine facade — the Spark-native equivalent of the reference's
  * `root → database → measurement → series → points` hierarchy
  * (reference doc/README.txt:20-29) and its full DDL + mutation surface
  * (server command table src/tsdbserver/server.cc:245-327).
  *
  * Storage layout (SURVEY.md §7.1) — engine-managed, pruning-first:
  * {{{
  * rootDir/_config.json                      bucket width (once, validated on open)
  * rootDir/<db>/<meas>/_schema.json          MeasurementSchema (atomic tmp+rename)
  * rootDir/<db>/<meas>/_wm/                  watermark TABLE (see WatermarkStore)
  * rootDir/<db>/<meas>/_meta/.<series>.pending  append-intent markers
  * rootDir/<db>/<meas>/data/series=<s>/bucket=<b>/  parquet, sorted by time_ns
  * }}}
  *
  * This replaces the reference's per-series chunk `index` binary search
  * (select_op.cc:50-59) with Spark partition pruning on `(series, bucket)`
  * plus Parquet row-group min/max stats: a time-range query reads only the
  * touched buckets — at 100 TB the difference between one bucket and a full
  * scan. Series are "embarrassingly parallel" (doc/LOCKING.txt:3-8): the
  * partition layout preserves that property for the cluster.
  *
  * Concurrency: the reference serializes writers per series with flocks
  * (series.h:42-179). Here the contract is single-writer-per-series (Spark
  * jobs are the writers); readers always see a consistent snapshot because
  * parquet files are immutable and the watermark swap is atomic (rename).
  *
  * Metadata scale: watermarks live in ONE log-structured table per
  * measurement ([[WatermarkStore]]): every update — single-series append or
  * a 10⁴-series micro-batch — commits one small atomic delta file, readers
  * list a bounded directory (snapshot + ≤64 deltas) instead of one object
  * per series, and the decoded table is signature-cached so repeat loads
  * cost one `listStatus`. This removes the r1-r5 per-series-JSON ceiling
  * (~10⁵ series: the listing itself became the bottleneck); the reference's
  * per-series `time_first`/`time_last` files (series.cc:56-72) are the
  * single-node analog.
  */
final class Tsdb(val spark: SparkSession, val rootDir: String,
                 requestedBucketWidth: Long = Tsdb.UseExistingWidth,
                 maxPrunedBuckets: Int = Tsdb.DefaultMaxPrunedBuckets,
                 autoRefreshValueIndex: Boolean = false) {
  import MeasurementSchema.{BucketCol, SeriesCol, TimeCol}

  GraftFunctions.register(spark)

  private val hconf = spark.sessionState.newHadoopConf()
  private def fs(p: Path): FileSystem = p.getFileSystem(hconf)
  private val root = new Path(rootDir)

  /** Bucket width in time units (reference `chunk_size` config analog,
    * src/libtsdb/root.cc:41-45: persisted once, validated on every open).
    * Opening an existing root with an explicit width that differs from the
    * persisted one is an error — mirroring the reference's config validation
    * on open; omit the argument to adopt whatever the root was created with. */
  val bucketWidth: Long = {
    val explicit = requestedBucketWidth != Tsdb.UseExistingWidth
    if (explicit) require(requestedBucketWidth > 0, "bucket width must be positive")
    val cfg = new Path(root, "_config.json")
    val f = fs(cfg)
    if (f.exists(cfg)) {
      val Re = """\{"version":1,"bucket_width":(\d+)\}""".r
      val persisted = readString(cfg).trim match {
        case Re(w) => w.toLong
        case other => throw new InvalidSchemaException(s"corrupt engine config: $other")
      }
      if (explicit && persisted != requestedBucketWidth)
        throw new InvalidSchemaException(
          s"root $rootDir has bucket_width=$persisted; requested $requestedBucketWidth")
      persisted
    } else {
      val w = if (explicit) requestedBucketWidth else Tsdb.DefaultBucketWidth
      f.mkdirs(root)
      atomicWrite(cfg, s"""{"version":1,"bucket_width":$w}""")
      w
    }
  }

  // ---------------------------------------------------------------- catalog

  /** CREATE DATABASE — idempotent mkdir (reference src/libtsdb/root.cc:147-156). */
  def createDatabase(db: String): Unit = {
    validName(db, "database")
    fs(root).mkdirs(dbPath(db))
  }

  /** Sorted database listing (reference src/libtsdb/root.cc:158-164). */
  def listDatabases(): Seq[String] = listDirs(root).filterNot(_.startsWith("_"))

  /** CREATE MEASUREMENT — idempotent iff the schema is identical; a differing
    * field set raises (reference src/libtsdb/measurement.cc:96-111). Creation
    * is atomic via tmp+rename (measurement.cc:65-151). */
  def createMeasurement(db: String, m: String, schema: MeasurementSchema): Unit = {
    validName(m, "measurement")
    if (!fs(root).exists(dbPath(db))) throw new NoSuchDatabaseException(db)
    schema.validated()
    val sp = schemaPath(db, m)
    if (fs(sp).exists(sp)) {
      val existing = MeasurementSchema.fromJson(readString(sp))
      if (existing != schema)
        throw new MeasurementExistsException(db, m,
          s"existing=${existing.toJson} requested=${schema.toJson}")
    } else {
      fs(sp).mkdirs(measPath(db, m))
      atomicWrite(sp, schema.toJson)
    }
  }

  /** GET SCHEMA (reference src/tsdbserver/server.cc:441-460). */
  def getSchema(db: String, m: String): MeasurementSchema = {
    val sp = schemaPath(db, m)
    if (!fs(sp).exists(sp)) {
      if (!fs(root).exists(dbPath(db))) throw new NoSuchDatabaseException(db)
      throw new NoSuchMeasurementException(db, m)
    }
    MeasurementSchema.fromJson(readString(sp))
  }

  /** LIST MEASUREMENTS (reference src/libtsdb/database.h:18-23). */
  def listMeasurements(db: String): Seq[String] = {
    if (!fs(root).exists(dbPath(db))) throw new NoSuchDatabaseException(db)
    listDirs(dbPath(db))
  }

  /** LIST SERIES — sorted (reference src/libtsdb/measurement.h:72-77).
    * Series exist from their first successful write (auto-create,
    * series.cc:20-109). One bounded directory listing however many series
    * the measurement holds (WatermarkStore). */
  def listSeries(db: String, m: String): Seq[String] = {
    getSchema(db, m) // existence check
    wmStore(db, m).load().keys.toSeq.sorted
  }

  /** Live range of a series; absent ⇒ the series has never been written. */
  def seriesRange(db: String, m: String, series: String): Option[SeriesRange] =
    wmStore(db, m).get(series)

  // ---------------------------------------------------------------- write

  /** Validated append — the reference's `write_wal` semantics
    * (src/libtsdb/wal.cc:53-347):
    *  - `time_ns` must be non-null and unique within the batch (the
    *    strictly-increasing rule, wal.cc:63-68; a DataFrame has no inherent
    *    order, so monotonicity degenerates to uniqueness — the engine imposes
    *    the physical order on write).
    *  - points below the delete watermark `time_first` are silently
    *    discarded (wal.cc:70-85).
    *  - points in `[time_first, time_last]` are an idempotent tail overwrite:
    *    accepted iff BITWISE identical to what is stored — float/double
    *    compared by raw IEEE-754 bits exactly like the reference's memcmp
    *    (wal.cc:87-246, 104, 116) — and the overlapped stored range must be
    *    covered exactly (no gaps, no never-seen past points). Any mismatch
    *    rejects the whole write.
    *  - points above `time_last` are appended, sorted, bucket-partitioned;
    *    the watermark then advances. Idempotent overwrite is what makes
    *    at-least-once streaming replay exactly-once (see graft.streaming).
    */
  def writePoints(db: String, m: String, series: String, points: DataFrame): WriteResult = {
    validSeriesName(series)
    val schema = getSchema(db, m)
    val cols = TimeCol +: schema.fields.map(_.name)
    val missing = cols.filterNot(points.columns.contains)
    if (missing.nonEmpty)
      throw new InvalidSchemaException(s"write batch missing columns: ${missing.mkString(",")}")
    val pts = points.select(
      col(TimeCol).cast(LongType).as(TimeCol) +:
      schema.fields.map(f => col(f.name).cast(f.ftype.spark).as(f.name)): _*)

    // single validation pass: batch size, NULL/duplicate timestamps, the
    // watermark partition counts AND the new-point count/range all come
    // from ONE aggregation job over the batch
    val wm = seriesRange(db, m, series)
    val (tf, tl) = wm.fold((Long.MinValue, Long.MinValue))(r => (r.timeFirst, r.timeLast))
    // "new" = above the append watermark AND not below the delete watermark
    // (time_first > time_last after a delete-into-the-future: points between
    // them are discarded, not appended); a never-written series takes
    // everything
    val isNew = if (wm.isEmpty) lit(true) else col(TimeCol) > tl && col(TimeCol) >= tf
    val stats = pts.agg(
      count(lit(1)).as("n"), count(col(TimeCol)).as("n_ts"),
      countDistinct(col(TimeCol)).as("n_distinct"),
      sum(when(col(TimeCol) < tf, 1L).otherwise(0L)).as("disc"),
      sum(when(col(TimeCol).between(tf, tl), 1L).otherwise(0L)).as("ov"),
      min(when(col(TimeCol).between(tf, tl), col(TimeCol))).as("ov_min"),
      count(when(isNew, lit(1))).as("new_n"),
      min(when(isNew, col(TimeCol))).as("new_min"),
      max(when(isNew, col(TimeCol))).as("new_max")).head()
    val n = stats.getLong(0)
    if (n == 0) return WriteResult(0, 0, 0)
    if (stats.getLong(1) < n)
      throw new OutOfOrderTimestampsException(s"${n - stats.getLong(1)} NULL $TimeCol values")
    if (stats.getLong(2) < n)
      throw new OutOfOrderTimestampsException(
        s"${n - stats.getLong(2)} duplicate timestamps within batch")

    val (discarded, overlapN) = if (wm.isEmpty) (0L, 0L) else {
      val ovN = stats.getLong(4)
      if (ovN > 0) verifyOverlap(db, m, series, schema,
        pts.filter(col(TimeCol).between(tf, tl)), stats.getLong(5), tl, ovN)
      (stats.getLong(3), ovN)
    }

    // crash recovery (reference write.cc:93-252: time_last-governed tail
    // truncation on open): a crash BETWEEN the data append and the watermark
    // advance leaves committed rows above time_last; replaying the batch
    // would duplicate them. The append-intent marker makes the check free on
    // the clean path: it exists on entry only if a previous append died
    // mid-flight, and only then is the (bucket-pruned) truncation scan run.
    // With NO watermark yet, everything stored is an orphan of a crashed
    // FIRST append — drop the series data dir so the replay starts clean.
    val pending = pendingPath(db, m, series)
    if (fs(pending).exists(pending)) {
      wm match {
        case Some(r) => truncateAbove(db, m, series, schema, r.timeLast)
        case None =>
          val sdir = seriesDir(db, m, series)
          fs(sdir).delete(sdir, true)
      }
      fs(pending).delete(pending, false)
    }

    // the write job, bracketed by the append-intent marker (removed after
    // the watermark advances); new-point count/range came from the stats job
    val newPts = if (wm.isEmpty) pts else pts.filter(isNew)
    val newN = stats.getLong(6)
    val written = if (newN == 0) 0L
                  else {
                    atomicWrite(pending, s"""{"version":1}""")
                    appendSorted(db, m, series, newPts, newN)
                  }
    if (written > 0 || wm.isEmpty) {
      val nstats = if (written > 0) Some((stats.getLong(7), stats.getLong(8))) else None
      val next = (wm, nstats) match {
        case (Some(r), Some((_, mx))) => SeriesRange(r.timeFirst, math.max(r.timeLast, mx))
        case (Some(r), None)          => r
        case (None, Some((mn, mx)))   => SeriesRange(mn, mx)
        case (None, None)             => SeriesRange(1, 0) // reference empty-series sentinel
      }
      wmStore(db, m).update(Map(series -> next))
    }
    if (written > 0) fs(pending).delete(pending, false)
    WriteResult(written, discarded, overlapN)
  }

  /** Bulk append of a MULTI-series batch in one distributed pass — the
    * backfill path (reference analog: large writes bypass the WAL and
    * commit directly, src/libtsdb/wal.cc:248-277). Where `writePoints` runs
    * one validation job + one write job PER series, bulkLoad runs one
    * validation job and one `partitionBy(series, bucket)` write job for the
    * whole batch — at backfill scale that is the difference between O(series)
    * and O(1) job launches, with the write spread over the full cluster.
    *
    * Semantics vs `writePoints`: same non-null/unique-per-series timestamp
    * validation, same silent discard of points below a series' delete
    * watermark `time_first`; but any point at-or-below an existing series'
    * `time_last` REJECTS the whole batch (no idempotent-rewrite window —
    * replays belong to the per-series path). Contract: exclusive writer for
    * the measurement while a bulk load runs (the shared `partitionBy` write
    * stages through one `_temporary/`; see `appendSorted` on why concurrent
    * same-directory jobs must not overlap).
    *
    * Crash safety: per-series append-intent markers bracket the write, so a
    * died bulk load is healed by the normal recovery on each series' next
    * append. @return per-series written counts. */
  def bulkLoad(db: String, m: String, points: DataFrame): Map[String, Long] =
    writeBatchImpl(db, m, points, allowOverlap = false)
      .collect { case (sn, r) if r.written > 0 => sn -> r.written }

  /** Validated append of a MULTI-series batch with `writePoints` semantics
    * per series — the streaming-sink path (SURVEY §7.2.7): below-watermark
    * points silently discard, points inside `[time_first, time_last]` are a
    * BITWISE-verified idempotent tail overwrite (reference wal.cc:87-246),
    * points above append. Unlike the per-series `writePoints` loop this runs
    * a FIXED number of Spark jobs whatever the series count: one stats
    * aggregation, one distributed overlap verify (only when a replayed tail
    * exists), one `partitionBy(series, bucket)` write, one watermark delta —
    * a micro-batch of 10⁴ series costs 3 jobs, not 2×10⁴ (the r5 streaming
    * dispatch ceiling; the reference's WAL serializes per series because it
    * is single-node, wal.cc:248-277).
    *
    * Contract: exclusive writer for the measurement while the batch commits
    * (one shared `_temporary/` staging dir — see `appendSorted`); a
    * micro-batch sink IS that exclusive writer. Any per-series validation
    * failure (NULL/duplicate timestamps, diverging overlap bytes) rejects
    * the WHOLE batch before anything lands — replay-safe.
    * @return per-series (written, discarded, overwriteVerified). */
  def writeBatch(db: String, m: String, points: DataFrame): Map[String, WriteResult] =
    writeBatchImpl(db, m, points, allowOverlap = true)

  private def writeBatchImpl(db: String, m: String, points: DataFrame,
                             allowOverlap: Boolean): Map[String, WriteResult] = {
    val schema = getSchema(db, m)
    val cols = SeriesCol +: TimeCol +: schema.fields.map(_.name)
    val missing = cols.filterNot(points.columns.contains)
    if (missing.nonEmpty)
      throw new InvalidSchemaException(s"bulk batch missing columns: ${missing.mkString(",")}")
    val pts = points.select(
      col(SeriesCol).cast(StringType).as(SeriesCol) +:
      col(TimeCol).cast(LongType).as(TimeCol) +:
      schema.fields.map(f => col(f.name).cast(f.ftype.spark).as(f.name)): _*)

    // existing watermarks, broadcast against the batch (catalog-scale;
    // ONE bounded load, not one file per series)
    val wms = wmStore(db, m).load()
    import spark.implicits._
    // NULL _tf/_tl = series with no watermark yet (everything appends, like
    // writePoints' wm.isEmpty path) — a real column-null flag, NOT a
    // Long.MinValue sentinel, which would collide with a representable
    // timestamp at the type's edge
    val tagged =
      if (wms.isEmpty)
        pts.withColumn("_tf", lit(null).cast(LongType))
          .withColumn("_tl", lit(null).cast(LongType))
      else {
        val wdf = broadcast(
          wms.toSeq.map { case (sn, r) => (sn, r.timeFirst, r.timeLast) }
            .toDF(SeriesCol, "_tf", "_tl"))
        pts.join(wdf, Seq(SeriesCol), "left")
      }
    // keep = above both watermarks (or a brand-new series); discard =
    // inside the delete window — identical visibility rules to writePoints
    val known = col("_tf").isNotNull
    val keep = !known || (col(TimeCol) > col("_tl") && col(TimeCol) >= col("_tf"))
    val inTail = known && col(TimeCol).between(col("_tf"), col("_tl"))

    // ONE validation job for every series
    val stats = tagged.groupBy(col(SeriesCol)).agg(
      count(lit(1)).as("n"), count(col(TimeCol)).as("n_ts"),
      countDistinct(col(TimeCol)).as("n_distinct"),
      sum(when(known && col(TimeCol) <= col("_tl"), 1L).otherwise(0L)).as("le_tl"),
      count(when(keep, lit(1))).as("new_n"),
      min(when(keep, col(TimeCol))).as("new_min"),
      max(when(keep, col(TimeCol))).as("new_max"),
      sum(when(known && col(TimeCol) < col("_tf"), 1L).otherwise(0L)).as("disc"),
      sum(when(inTail, 1L).otherwise(0L)).as("ov"),
      min(when(inTail, col(TimeCol))).as("ov_min")).collect()
    // row layout: series(0), n(1), n_ts(2), n_distinct(3), le_tl(4),
    // new_n(5), new_min(6), new_max(7), disc(8), ov(9), ov_min(10)
    stats.foreach { r =>
      val sn = r.getString(0)
      validSeriesName(sn)
      if (r.getLong(3) < r.getLong(1))
        throw new OutOfOrderTimestampsException(
          s"$sn: ${r.getLong(1) - r.getLong(3)} duplicate/NULL timestamps in bulk batch")
      if (!allowOverlap && r.getLong(4) > 0)
        throw new OverwriteMismatchException(
          s"$sn: ${r.getLong(4)} points at-or-below time_last — bulk load is append-only")
    }
    // replayed tails: ONE distributed bitwise verify over every overlapping
    // series at once (per-series writePoints semantics, reference
    // wal.cc:87-246 memcmp; the batch analog of verifyOverlap)
    if (allowOverlap) {
      val ovRows = stats.filter(_.getLong(9) > 0)
      if (ovRows.nonEmpty)
        verifyOverlapBatch(db, m, schema, tagged.filter(inTail),
          ovRows.map(r => (r.getString(0), r.getLong(10), wms(r.getString(0)).timeLast)))
    }
    // heal any series a previous append/bulk load died on (same recovery
    // rules as writePoints: truncate orphans above the watermark, or drop
    // the dir when no watermark was ever written)
    stats.map(_.getString(0)).foreach { sn =>
      val p = pendingPath(db, m, sn)
      if (fs(p).exists(p)) {
        wms.get(sn) match {
          case Some(r) => truncateAbove(db, m, sn, schema, r.timeLast)
          case None =>
            val sdir = seriesDir(db, m, sn)
            fs(sdir).delete(sdir, true)
        }
        fs(p).delete(p, false)
      }
    }

    def results: Map[String, WriteResult] = stats.map(r =>
      r.getString(0) -> WriteResult(r.getLong(5), r.getLong(8), r.getLong(9))).toMap
    val toWrite = stats.filter(_.getLong(5) > 0)
    if (toWrite.isEmpty) return results // fully-replayed / fully-discarded batch

    toWrite.foreach(r => atomicWrite(pendingPath(db, m, r.getString(0)), """{"version":1}"""))
    val par = spark.sparkContext.defaultParallelism
    tagged.filter(keep)
      .withColumn(BucketCol,
        expr(s"($TimeCol - pmod($TimeCol, ${bucketWidth}L)) div ${bucketWidth}L"))
      .select(col(SeriesCol) +: col(BucketCol) +: col(TimeCol) +:
        schema.fields.map(f => col(f.name)): _*)
      .repartitionByRange(par, col(SeriesCol), col(BucketCol), col(TimeCol))
      .sortWithinPartitions(SeriesCol, BucketCol, TimeCol)
      .write.mode("append").partitionBy(SeriesCol, BucketCol)
      .parquet(dataDir(db, m).toString)
    // ONE watermark commit for the whole batch (one delta file however many
    // series landed), then the intent markers drop
    wmStore(db, m).update(toWrite.map { r =>
      val sn = r.getString(0)
      val (mn, mx) = (r.getLong(6), r.getLong(7))
      r.getString(0) -> (wms.get(sn) match {
        case Some(prev) => SeriesRange(prev.timeFirst, math.max(prev.timeLast, mx))
        case None       => SeriesRange(mn, mx)
      })
    }.toMap)
    toWrite.foreach { r =>
      val p = pendingPath(db, m, r.getString(0))
      fs(p).delete(p, false)
    }
    results
  }

  /** Batch form of `verifyOverlap`: one full-outer join on (series, time_ns)
    * checks EVERY replayed tail at once — series-pruned via an IN filter on
    * the partition column, bucket-pruned to the overlapping range, and per
    * series the stored `[ov_min, time_last]` window must be covered exactly
    * with bitwise-identical field bytes. */
  private def verifyOverlapBatch(db: String, m: String, schema: MeasurementSchema,
                                 batchOverlap: DataFrame,
                                 ranges: Seq[(String, Long, Long)]): Unit = {
    import spark.implicits._
    val names = ranges.map(_._1)
    val b0 = ranges.map(r => Math.floorDiv(r._2, bucketWidth)).min
    val b1 = ranges.map(r => Math.floorDiv(r._3, bucketWidth)).max
    val rdf = broadcast(ranges.toDF(SeriesCol, "_vmin", "_vmax"))
    val stored = readMeasurement(db, m, schema)
      .filter(col(SeriesCol).isin(names: _*) && col(BucketCol).between(b0, b1))
      .join(rdf, SeriesCol)
      .filter(col(TimeCol).between(col("_vmin"), col("_vmax")))
    def bits(df: DataFrame, prefix: String): DataFrame =
      df.select(col(SeriesCol) +: col(TimeCol) +:
        schema.fields.map(f => GraftFunctions.bitwiseComparable(col(f.name), f.ftype.spark)
          .as(s"$prefix${f.name}")) :+ lit(true).as(s"${prefix}present"): _*)
    val joined = bits(stored, "s_")
      .join(bits(batchOverlap, "w_"), Seq(SeriesCol, TimeCol), "full_outer")
    val bad = joined.filter(
        col("s_present").isNull || col("w_present").isNull ||
        schema.fields.map(f => !(col(s"s_${f.name}") <=> col(s"w_${f.name}")))
          .reduceOption(_ || _).getOrElse(lit(false)))
      .groupBy(col(SeriesCol)).count().collect()
    if (bad.nonEmpty)
      throw new OverwriteMismatchException(
        s"$db/$m: replayed tail differs from storage — " +
          bad.map(r => s"${r.getString(0)}: ${r.getLong(1)} points").mkString("; "))
  }

  /** Bitwise comparison of the overlap region against storage: a full-outer
    * join on `time_ns` over the (bucket-pruned) stored tail. Any row present
    * on one side only, or any field whose raw bits differ, rejects the write
    * (reference memcmp of the raw chunk bytes, src/libtsdb/wal.cc:104,116). */
  private def verifyOverlap(db: String, m: String, series: String,
                            schema: MeasurementSchema, overlap: DataFrame,
                            ovMin: Long, tl: Long, ovN: Long): Unit = {
    val stored = seriesData(db, m, series, schema, ovMin, tl)
    def bits(df: DataFrame, prefix: String): DataFrame =
      df.select(col(TimeCol) +:
        schema.fields.map(f => GraftFunctions.bitwiseComparable(col(f.name), f.ftype.spark)
          .as(s"$prefix${f.name}")) :+ lit(true).as(s"${prefix}present"): _*)
    val joined = bits(stored, "s_").join(bits(overlap, "w_"), Seq(TimeCol), "full_outer")
    val bad = joined.filter(
      col("s_present").isNull || col("w_present").isNull ||
      schema.fields.map(f => !(col(s"s_${f.name}") <=> col(s"w_${f.name}")))
        .reduceOption(_ || _).getOrElse(lit(false))).count()
    if (bad > 0)
      throw new OverwriteMismatchException(
        s"$db/$m/$series: $bad of $ovN overlapping points differ from storage in [$ovMin,$tl]")
  }

  /** Physical append: bucket-derived partition, range-partitioned so each
    * task owns contiguous buckets, rows sorted by time within files (gives
    * parquet row-group min/max stats their pruning power).
    *
    * Each write targets ITS OWN `series=<s>/` directory (partitioned by
    * bucket below it) rather than partitionBy(series, bucket) on the shared
    * root: concurrent same-directory jobs share one `_temporary/` staging
    * dir and corrupt each other, while per-series directories make
    * DIFFERENT-series writes safely concurrent — the engine contract is
    * single-writer-per-SERIES, and series are independent
    * (reference doc/LOCKING.txt:3-8). Readers see the same layout either
    * way (`series=` is a partition directory under basePath). */
  private def appendSorted(db: String, m: String, series: String, newPts: DataFrame,
                           cnt: Long): Long = {
    // floor-division bucket id in exact integer arithmetic (`div` truncates
    // toward zero and double-based floor() loses precision above 2^53 —
    // time_ns at ns scale exceeds that). pmod is non-negative, so
    // (t - pmod(t, w)) is exactly divisible and the quotient is floorDiv —
    // matching Math.floorDiv on every read/truncate/delete path.
    val withBucket = newPts
      .withColumn(BucketCol,
        expr(s"($TimeCol - pmod($TimeCol, ${bucketWidth}L)) div ${bucketWidth}L"))
    // Small batches hash-partition on bucket: each bucket lands whole in one
    // task → one sorted file per bucket, and no extra pass over the data
    // (repartitionByRange samples the batch to compute range bounds — a
    // whole job the common streaming micro-batch doesn't need). Huge batches
    // pay that sampling pass so a hot bucket can split into several
    // disjoint-range sorted files instead of one giant task.
    val par = spark.sparkContext.defaultParallelism
    val arranged =
      if (cnt <= Tsdb.RangeWriteThreshold)
        // full parallelism even for small batches: per-bucket FILE CREATION
        // is the fixed cost (one parquet writer per bucket dir), so buckets
        // must spread across tasks; empty partitions are ~free
        withBucket.repartition(par, col(BucketCol))
      else withBucket.repartitionByRange(par, col(BucketCol), col(TimeCol))
    arranged
      .sortWithinPartitions(BucketCol, TimeCol)
      .write.mode("append").partitionBy(BucketCol)
      .parquet(seriesDir(db, m, series).toString)
    cnt
  }

  /** Remove stored rows with `time_ns > tl` (orphans of a crashed append —
    * invisible to readers because every read clamps to the watermark, but
    * they would collide with the re-append on replay). Whole buckets above
    * `tl` are dropped; a partially-affected boundary bucket is rewritten
    * truncated (reference `replace_with_truncated`, root.cc:179-194). The
    * procedure is idempotent: a crash mid-recovery just reruns it. */
  private def truncateAbove(db: String, m: String, series: String,
                            schema: MeasurementSchema, tl: Long): Unit = {
    val sdir = seriesDir(db, m, series)
    val f = fs(sdir)
    if (!f.exists(sdir)) return
    val cutBucket = Math.floorDiv(tl, bucketWidth)
    var boundaryExists = false
    f.listStatus(sdir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(s"$BucketCol=")) {
        val b = name.stripPrefix(s"$BucketCol=").toLong
        if (b > cutBucket) f.delete(st.getPath, true)
        else if (b == cutBucket) boundaryExists = true
      }
    }
    if (!boundaryExists) return
    val bdir = new Path(sdir, s"$BucketCol=$cutBucket")
    val bdf = spark.read.schema(schema.dataStruct).parquet(bdir.toString)
    // footer-stats-only job: cheap when the bucket is clean (the usual case)
    val mx = bdf.agg(max(TimeCol)).head()
    if (mx.isNullAt(0) || mx.getLong(0) <= tl) return
    val tmp = new Path(sdir, s".$BucketCol=$cutBucket.truncating")
    f.delete(tmp, true)
    bdf.filter(col(TimeCol) <= tl)
      .repartition(1).sortWithinPartitions(TimeCol)
      .write.mode("overwrite").parquet(tmp.toString)
    f.delete(bdir, true)
    val fc = FileContext.getFileContext(bdir.toUri, hconf)
    fc.rename(tmp, bdir, Options.Rename.OVERWRITE)
  }

  // ---------------------------------------------------------------- compact

  /** Compact a series: rewrite every bucket directory holding more than one
    * file into time-sorted zstd parquet (reference analog: full chunks
    * become gzip-compressed read-only, src/libtsdb/write.cc:266-315 — here
    * the append path stays on fast codecs and compaction produces the dense
    * immutable form). Streaming micro-batch ingest is exactly the workload
    * that fragments buckets; at scale, scan cost is per-FILE as much as
    * per-byte, so this is the maintenance op that keeps reads O(buckets).
    *
    * One distributed job rewrites ALL fragmented buckets (bucket-pruned
    * read, range-partitioned by (bucket, time) so hot buckets split into
    * several disjoint-range sorted files); the swap is per-bucket atomic
    * (old dir → trash, new dir → live, trash dropped last) and
    * crash-recoverable: a bucket can never be lost because its old files
    * are not deleted until its new files are in place — `recoverCompact`
    * restores any bucket caught mid-swap. Contract: same single writer per
    * series as writePoints (no append may run concurrently).
    *
    * @return number of buckets rewritten */
  def compact(db: String, m: String, series: String): Long = {
    val schema = getSchema(db, m)
    val sdir = seriesDir(db, m, series)
    val f = fs(sdir)
    recoverCompact(sdir)
    if (!f.exists(sdir)) return 0L
    val fragmented = f.listStatus(sdir).toSeq.filter { st =>
      st.getPath.getName.startsWith(s"$BucketCol=") &&
        f.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet")) > 1
    }.map(_.getPath.getName.stripPrefix(s"$BucketCol=").toLong)
    if (fragmented.isEmpty) return 0L

    val tmp = new Path(sdir, Tsdb.CompactTmp)
    val trash = new Path(sdir, Tsdb.CompactTrash)
    f.delete(tmp, true)
    f.delete(trash, true)
    // one distributed rewrite of every fragmented bucket: the bucket IN-list
    // prunes the scan to exactly those directories
    spark.read.option("basePath", sdir.toString)
      .schema(StructType(schema.dataStruct.fields.toSeq :+ StructField(BucketCol, LongType)))
      .parquet(sdir.toString)
      .filter(col(BucketCol).isin(fragmented: _*))
      .repartitionByRange(col(BucketCol), col(TimeCol))
      .sortWithinPartitions(BucketCol, TimeCol)
      .write.option("compression", "zstd").partitionBy(BucketCol)
      .parquet(tmp.toString)
    // per-bucket atomic swap; old files survive in trash until the new dir
    // is live, so a crash anywhere leaves the bucket recoverable
    f.mkdirs(trash)
    val fc = FileContext.getFileContext(sdir.toUri, hconf)
    fragmented.foreach { b =>
      val live = new Path(sdir, s"$BucketCol=$b")
      val next = new Path(tmp, s"$BucketCol=$b")
      if (f.exists(next)) { // empty buckets can't exist, but stay defensive
        fc.rename(live, new Path(trash, s"$BucketCol=$b"), Options.Rename.OVERWRITE)
        fc.rename(next, live, Options.Rename.NONE)
      }
    }
    f.delete(trash, true)
    f.delete(tmp, true)
    fragmented.size.toLong
  }

  /** Crash recovery for `compact`: any bucket moved to trash whose live dir
    * never appeared is restored (the compacted data was equal by
    * construction, so restoring the original files is always correct);
    * leftover tmp/trash dirs are then dropped. Idempotent. */
  private def recoverCompact(sdir: Path): Unit = {
    val f = fs(sdir)
    val trash = new Path(sdir, Tsdb.CompactTrash)
    if (f.exists(trash)) {
      val fc = FileContext.getFileContext(sdir.toUri, hconf)
      f.listStatus(trash).foreach { st =>
        val live = new Path(sdir, st.getPath.getName)
        if (!f.exists(live)) fc.rename(st.getPath, live, Options.Rename.NONE)
      }
      f.delete(trash, true)
    }
    f.delete(new Path(sdir, Tsdb.CompactTmp), true)
  }

  // ---------------------------------------------------------------- delete

  /** Delete-from-front: `DELETE WHERE time_ns <= t` advances `time_first` to
    * the first surviving timestamp — or to `t+1` when none exists, the
    * reference's "delete into the future" which also pre-filters future
    * writes below it (src/libtsdb/delete.cc:10-162, 82-98). Buckets entirely
    * below the new watermark are physically dropped (partition drop — the
    * reference unlinks orphaned chunk files, delete.cc:119-148); the
    * first partially-covered bucket is masked by the read-side clamp. */
  def deleteUpTo(db: String, m: String, series: String, t: Long): Unit = {
    val schema = getSchema(db, m)
    val wm = seriesRange(db, m, series)
      .getOrElse(throw new NoSuchSeriesException(db, m, series))
    if (t < wm.timeFirst) return // nothing to delete
    val surviving = seriesData(db, m, series, schema, t + 1, wm.timeLast)
      .agg(min(TimeCol)).head()
    val newFirst = if (surviving.isNullAt(0)) t + 1 else surviving.getLong(0)
    wmStore(db, m).update(Map(series -> SeriesRange(newFirst, wm.timeLast)))
    // drop buckets fully below the watermark
    val sdir = seriesDir(db, m, series)
    val f = fs(sdir)
    if (f.exists(sdir)) {
      val cutBucket = Math.floorDiv(newFirst, bucketWidth)
      f.listStatus(sdir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(s"$BucketCol=") &&
            name.stripPrefix(s"$BucketCol=").toLong < cutBucket)
          f.delete(st.getPath, true)
      }
    }
  }

  /** Retention sweep: `DELETE WHERE time_ns <= t` for EVERY series of the
    * measurement — the policy form of `deleteUpTo` (the reference only has
    * the per-series verb, src/libtsdb/delete.cc:10-162; a fleet applies the
    * same horizon to thousands of series). One distributed aggregation finds
    * every affected series' first surviving timestamp (the per-series path
    * would launch one min() job per series); watermark advances and bucket
    * drops then run per series on the driver, metadata-scale.
    * @return the new `time_first` per affected series. */
  def applyRetention(db: String, m: String, t: Long): Map[String, Long] =
    deleteUpToBatch(db, m,
      wmStore(db, m).load().keys.map(_ -> t).toMap)

  /** Batched `deleteUpTo` with a PER-SERIES horizon — `applyRetention`'s
    * general form (one shared horizon is the policy case; the reflector
    * flush cuts each series at its own flushed watermark). One distributed
    * aggregation finds every affected series' first surviving timestamp;
    * watermark advances and bucket drops then run per series on the driver,
    * metadata-scale. @return the new `time_first` per affected series. */
  def deleteUpToBatch(db: String, m: String, cuts: Map[String, Long]): Map[String, Long] = {
    val schema = getSchema(db, m)
    val wms = wmStore(db, m).load()
    val affected = cuts.toSeq.flatMap { case (sn, t) =>
      // below-watermark cuts are no-ops; unknown series are ignored
      wms.get(sn).filter(r => t >= r.timeFirst).map(r => (sn, t, r))
    }
    if (affected.isEmpty) return Map.empty
    import spark.implicits._
    val wdf = broadcast(affected.map { case (sn, t, r) => (sn, t, r.timeLast) }
      .toDF(SeriesCol, "_cut", "_tl"))
    // survivors can only live in buckets at/above the lowest cut's bucket
    // AND above the lowest cut itself — both predicates sit on the SCAN
    // (partition prune + parquet row-group stats); the exact per-series cut
    // applies after the broadcast join
    val minCut = affected.map(_._2).min
    val minBucket = Math.floorDiv(minCut + 1, bucketWidth)
    val surv = readMeasurement(db, m, schema)
      .filter(col(BucketCol) >= minBucket && col(TimeCol) > minCut)
      .join(wdf, SeriesCol)
      .filter(col(TimeCol) > col("_cut") &&
              col(TimeCol) <= col("_tl")) // ignore crashed-append orphans
      .groupBy(col(SeriesCol)).agg(min(TimeCol).as("mn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val advanced = affected.map { case (sn, t, r) =>
      // none survive -> delete into the future
      sn -> (surv.getOrElse(sn, t + 1), r.timeLast)
    }
    // ONE watermark commit for every swept series, then the bucket drops
    wmStore(db, m).update(advanced.map { case (sn, (nf, tl)) =>
      sn -> SeriesRange(nf, tl)
    }.toMap)
    advanced.foreach { case (sn, (newFirst, _)) =>
      val sdir = seriesDir(db, m, sn)
      val f = fs(sdir)
      if (f.exists(sdir)) {
        val cutBucket = Math.floorDiv(newFirst, bucketWidth)
        f.listStatus(sdir).foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith(s"$BucketCol=") &&
              name.stripPrefix(s"$BucketCol=").toLong < cutBucket)
            f.delete(st.getPath, true)
        }
      }
    }
    advanced.map { case (sn, (nf, _)) => sn -> nf }.toMap
  }

  // ---------------------------------------------------------------- read

  /** One series' stored points in `[t0, t1]`, bucket-pruned, NOT watermark
    * clamped (internal: overlap verify + delete need raw storage). */
  private def seriesData(db: String, m: String, series: String,
                         schema: MeasurementSchema, t0: Long, t1: Long): DataFrame = {
    val (b0, b1) = (Math.floorDiv(t0, bucketWidth), Math.floorDiv(t1, bucketWidth))
    // Open ONLY the admitted bucket directories, like the reference's
    // per-series chunk index (src/libtsdb/index read path): a whole-tree
    // spark.read.parquet(dir) pays partition DISCOVERY over every
    // series=/bucket= directory of the measurement — at 10× the horizon
    // that listing alone cost more than the pruned scan (ScaleBench caught
    // engine_count at 23× wall for 10× data). Listing the ONE series dir
    // bounds discovery at that series' bucket count, and the explicit leaf
    // paths bound it at the admitted buckets.
    val dir = dataDir(db, m)
    val sdir = seriesDir(db, m, series)
    val fsys = fs(dir)
    val bpfx = s"$BucketCol="
    val paths =
      if (!fsys.exists(sdir)) Array.empty[String]
      else fsys.listStatus(sdir).flatMap { st =>
        val n = st.getPath.getName
        if (!n.startsWith(bpfx)) None
        else scala.util.Try(n.substring(bpfx.length).toLong).toOption
          .filter(b => b >= b0 && b <= b1)
          .map(_ => st.getPath.toString)
      }
    val raw =
      if (paths.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[Row](),
          readStructOf(schema))
      else
        spark.read.option("basePath", dir.toString).schema(readStructOf(schema))
          .parquet(paths.toIndexedSeq: _*)
    // same predicate as the whole-tree form: series/bucket are redundant
    // with the path selection but keep the audited PartitionFilters shape
    // (TsdbEngineSpec pins them) and guard against a stray path
    raw.filter(col(SeriesCol) === series &&
               col(BucketCol).between(b0, b1) &&
               col(TimeCol).between(t0, t1))
  }

  /** Visible points of EVERY series in `[t0, t1]` — the multi-series
    * analogue of [[seriesData]]: ONE measurement-dir listing + one bounded
    * bucket listing per series whose watermark range intersects the ask,
    * each clamped to that series' own visible range before bucket
    * admission. This is the reference's per-series chunk-index walk
    * (src/libtsdb/select_op.cc:50-59) generalized to S series; the
    * whole-tree `spark.read.parquet(dataDir)` it replaces paid partition
    * DISCOVERY over every series×bucket directory of the measurement —
    * ScaleBench held the all-series window face at 5.4× wall for 10× data
    * on that listing alone. Discovery here is S+1 driver-side listings
    * bounded by the admitted buckets; the per-row watermark clamp rides the
    * same broadcast join as [[visible]]. */
  private def visibleRange(db: String, m: String,
                           t0: Long, t1: Long): DataFrame = {
    val schema = getSchema(db, m)
    def empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), readStructOf(schema))
    // per-series clamp: series whose visible range misses [t0,t1] never
    // reach the filesystem at all
    val clamped = wmStore(db, m).load().flatMap { case (sn, r) =>
      val c0 = math.max(t0, r.timeFirst); val c1 = math.min(t1, r.timeLast)
      if (c0 > c1) None else Some(sn -> (c0, c1))
    }
    val dir = dataDir(db, m)
    val fsys = fs(dir)
    if (clamped.isEmpty || !fsys.exists(dir)) return empty
    val (spfx, bpfx) = (s"$SeriesCol=", s"$BucketCol=")
    val paths = fsys.listStatus(dir).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (!st.isDirectory || !n.startsWith(spfx)) Iterator.empty
      else clamped.get(org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(n.substring(spfx.length)))
        .iterator.flatMap { case (c0, c1) =>
          val (b0, b1) =
            (Math.floorDiv(c0, bucketWidth), Math.floorDiv(c1, bucketWidth))
          fsys.listStatus(st.getPath).iterator.flatMap { bst =>
            val bn = bst.getPath.getName
            if (!bn.startsWith(bpfx)) None
            else scala.util.Try(bn.substring(bpfx.length).toLong).toOption
              .filter(b => b >= b0 && b <= b1)
              .map(_ => bst.getPath.toString)
          }
        }
    }.toIndexedSeq
    if (paths.isEmpty) return empty
    val raw = spark.read.option("basePath", dir.toString)
      .schema(readStructOf(schema)).parquet(paths: _*)
    import spark.implicits._
    val wdf = clamped.toSeq.map { case (s, (c0, c1)) => (s, c0, c1) }
      .toDF(SeriesCol, "_c0", "_c1")
    raw.filter(col(TimeCol).between(t0, t1)) // constant bounds → parquet pushdown
      .join(broadcast(wdf), SeriesCol)
      .filter(col(TimeCol) >= col("_c0") && col(TimeCol) <= col("_c1"))
      .drop("_c0", "_c1")
  }

  private def readStructOf(schema: MeasurementSchema): StructType =
    StructType(schema.dataStruct.fields.toSeq :+
      StructField(SeriesCol, StringType) :+ StructField(BucketCol, LongType))

  private def readMeasurement(db: String, m: String, schema: MeasurementSchema): DataFrame = {
    val dir = dataDir(db, m)
    if (!fs(dir).exists(dir))
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        readStructOf(schema))
    else
      spark.read.option("basePath", dir.toString).schema(readStructOf(schema))
        .parquet(dir.toString)
  }

  /** All VISIBLE points of a measurement: per-series clamp to
    * `[time_first, time_last]` via a broadcast watermark join (reference
    * read clamp src/libtsdb/select_op.cc:18-19). */
  def visible(db: String, m: String): DataFrame = {
    val schema = getSchema(db, m)
    val wms = wmStore(db, m).load()
    val raw = readMeasurement(db, m, schema)
    if (wms.isEmpty) return raw.limit(0)
    import spark.implicits._
    val wdf = wms.toSeq.map { case (s, r) => (s, r.timeFirst, r.timeLast) }
      .toDF(SeriesCol, "_tf", "_tl")
    raw.join(broadcast(wdf), SeriesCol)
      .filter(col(TimeCol) >= col("_tf") && col(TimeCol) <= col("_tl"))
      .drop("_tf", "_tl")
  }

  /** Visible points of ONE series in `[t0, t1]` — the range is clamped on
    * the driver from the watermark, so both bucket pruning and the parquet
    * pushdown see tight constants. */
  def visibleSeries(db: String, m: String, series: String, t0: Long, t1: Long): DataFrame = {
    val schema = getSchema(db, m)
    val wm = seriesRange(db, m, series)
      .getOrElse(throw new NoSuchSeriesException(db, m, series))
    val (c0, c1) = (math.max(t0, wm.timeFirst), math.min(t1, wm.timeLast))
    if (c0 > c1) return readMeasurement(db, m, schema).limit(0)
    seriesData(db, m, series, schema, c0, c1)
  }

  /** SELECT fields FROM db/m/series WHERE t0 <= time <= t1 [LIMIT n | LAST n]
    * (reference select_op_first/last, src/libtsdb/select_op.cc:175-371). */
  def select(db: String, m: String, series: String, fields: Seq[String],
             t0: Long, t1: Long, limit: Option[Int] = None,
             last: Option[Int] = None): DataFrame = {
    val schema = getSchema(db, m)
    val proj = TimeCol +: (if (fields.isEmpty) schema.fields.map(_.name) else {
      val unknown = fields.filterNot(schema.fields.map(_.name).contains)
      if (unknown.nonEmpty)
        throw new InvalidSchemaException(s"unknown fields: ${unknown.mkString(",")}")
      fields
    })
    val base = visibleSeries(db, m, series, t0, t1)
    last match {
      case Some(k) => TimeSeriesOps.selectLast(base, TimeCol, t0, t1, k, proj)
      case None    => TimeSeriesOps.selectRange(base, TimeCol, t0, t1, proj, limit)
    }
  }

  /** COUNT (npoints, time_first, time_last) of the range (reference
    * count_points, src/libtsdb/count.cc:100-112). */
  def countPoints(db: String, m: String, series: String, t0: Long, t1: Long): DataFrame =
    TimeSeriesOps.countPoints(visibleSeries(db, m, series, t0, t1), TimeCol, t0, t1)

  /** Windowed sum/min/max/count incl. empty windows (reference sum_op). */
  def sumWindows(db: String, m: String, series: String, field: String,
                 t0: Long, t1: Long, windowWidth: Long): DataFrame =
    TimeSeriesOps.sumWindows(visibleSeries(db, m, series, t0, t1),
      TimeCol, field, t0, t1, windowWidth)

  /** Multi-field windowed aggregation — the reference sum_op's actual
    * signature (field LIST, one pass: src/libtsdb/sum_op.cc:115-183).
    * Empty fields list = all schema fields. The default sum expression is
    * derived PER FIELD from the measurement schema: integer fields take the
    * native exact integer sum (a decimal-2 accumulation would come back as
    * double and lose exactness past 2^53), floats take the order-independent
    * decimal-2 accumulation, bools count trues. Pass `sumFor` to override. */
  def sumWindowsMulti(db: String, m: String, series: String, fields: Seq[String],
                      t0: Long, t1: Long, windowWidth: Long,
                      sumFor: Option[String => Column] = None): DataFrame = {
    val schema = getSchema(db, m)
    val fs = if (fields.isEmpty) schema.fields.map(_.name) else fields
    val byType: String => Column = c =>
      schema.fields.find(_.name == c).map(_.ftype) match {
        case Some(FieldType.F64) | Some(FieldType.F32) => TimeSeriesOps.sumExact2(col(c))
        case Some(FieldType.Bool)                      => sum(col(c).cast("long"))
        case _                                         => sum(col(c)) // integer/decimal: native exact
      }
    TimeSeriesOps.sumWindowsMulti(visibleSeries(db, m, series, t0, t1),
      TimeCol, fs, t0, t1, windowWidth, sumFor.getOrElse(byType))
  }

  /** Windowed sum/min/max/count for EVERY series of a measurement in ONE
    * scan + one (series, window)-keyed aggregation — the multi-series
    * dashboard panel shape. The reference serves this as N per-series
    * `sum_op` round trips (the Grafana datasource fans out one query per
    * series, datasource.go); at 100 TB one job with map-side partial
    * aggregation beats S sequential scans of the same measurement.
    * Windows align to absolute multiples of `windowWidth` (same rule as
    * `sum_op`, src/libtsdb/sum_op.cc:9-10); NON-EMPTY windows only — the
    * empty-window spine is a per-series range concept the single-series
    * faces emit; materializing S×W spine cells here would dwarf the data.
    * Float sums use the order-independent decimal-2 accumulation. */
  def sumWindowsAll(db: String, m: String, field: String,
                    t0: Long, t1: Long, windowWidth: Long): DataFrame = {
    val schema = getSchema(db, m)
    if (!schema.fields.exists(_.name == field))
      throw new InvalidSchemaException(s"unknown field: $field")
    require(windowWidth > 0, "window width must be positive")
    visibleRange(db, m, t0, t1)
      .groupBy(col(SeriesCol),
        (col(TimeCol) - pmod(col(TimeCol), lit(windowWidth))).as("window_start"))
      .agg(TimeSeriesOps.sumExact2(col(field)).as("sum_value"),
        min(col(field)).as("min_value"), max(col(field)).as("max_value"),
        count(col(field)).as("n"))
  }

  /** Windowed MEAN — derived sum/count like the reference clients
    * (src/tsdbcli2/main.cc:203-238); non-empty windows only. */
  def meanWindows(db: String, m: String, series: String, field: String,
                  t0: Long, t1: Long, windowWidth: Long): DataFrame =
    TimeSeriesOps.meanWindows(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, t0, t1, windowWidth)

  /** Grafana-style ZOOM dispatch (reference datasource.go:236-249: the
    * panel issues a raw select when the range holds few enough points,
    * otherwise a windowed MEAN at panel resolution): `npoints <=
    * maxDataPoints` → raw points; else per-window decimal-2 means over
    * `ceil(span / maxDataPoints)`-wide absolute-aligned windows (non-empty
    * windows — the renderer interpolates gaps). The decision is one
    * O(index-scale) count, exactly the reference's npoints check. Unified
    * output: (time_ns, v, n, zoom_mode) with n = points behind each row. */
  def zoom(db: String, m: String, series: String, field: String,
           t0: Long, t1: Long, maxDataPoints: Int): DataFrame = {
    require(maxDataPoints > 0, "maxDataPoints must be positive")
    val schema = getSchema(db, m)
    if (!schema.fields.exists(_.name == field))
      throw new InvalidSchemaException(s"unknown field: $field")
    val np = countPoints(db, m, series, t0, t1)
      .select("npoints").head().getLong(0)
    val base = visibleSeries(db, m, series, t0, t1)
    if (np <= maxDataPoints)
      base.select(col(TimeCol), col(field).cast("double").as("v"),
        when(col(field).isNotNull, 1L).otherwise(0L).as("n"),
        lit("raw").as("zoom_mode"))
    else {
      val span = t1 - t0 + 1
      val w = (span + maxDataPoints - 1) / maxDataPoints
      base.filter(col(field).isNotNull)
        .groupBy((col(TimeCol) - pmod(col(TimeCol), lit(w))).as(TimeCol))
        .agg((TimeSeriesOps.sumExact2(col(field)) / count(col(field))).as("v"),
          count(col(field)).as("n"))
        .select(col(TimeCol), col("v"), col("n"), lit("mean").as("zoom_mode"))
    }
  }

  /** Grafana "All"-series ZOOM dispatch — the reference datasource's
    * per-series loop (datasource.go:209-221 fans out one count + one
    * select/mean round trip per series) collapsed into TWO jobs total:
    * a count pre-pass (one aggregate-only scan, shuffles S per-series
    * counts — column-pruned to series + time at the parquet reader) whose
    * result drives the per-series raw-vs-mean decision exactly like
    * [[zoom]]'s npoints check, then ONE data scan + ONE shuffle where the
    * grouping key is conditional: raw series group by their own timestamp
    * (groups of ONE row — the validated append path enforces strictly
    * increasing timestamps per series, reference doc/README.txt:20-29, so
    * a (series, ts) group can never hold two points and the aggregate
    * returns each point verbatim), dense series by the absolute-aligned
    * window. Per-series semantics are identical to S
    * independent [[zoom]] calls: raw rows keep NULL field values (n = 0),
    * mean windows are non-empty decimal-2 means. Output: (series,
    * time_ns, v, n, zoom_mode). */
  def zoomAll(db: String, m: String, field: String,
              t0: Long, t1: Long, maxDataPoints: Int,
              inListMax: Int = Tsdb.ZoomAllInListMax): DataFrame = {
    require(maxDataPoints > 0, "maxDataPoints must be positive")
    require(inListMax >= 0, "inListMax must be non-negative")
    val schema = getSchema(db, m)
    if (!schema.fields.exists(_.name == field))
      throw new InvalidSchemaException(s"unknown field: $field")
    val base = visibleRange(db, m, t0, t1)
    val span = t1 - t0 + 1
    val w = (span + maxDataPoints - 1) / maxDataPoints
    // decision pre-pass: per-series point counts (aggregate-only job). At
    // dashboard scale the raw-side series list collects into a literal
    // In-list predicate — the data job stays ONE scan + ONE exchange with
    // no join. Past `inListMax` raw series the literal list would bloat
    // the plan/codegen linearly in S, so the decision ships as a
    // BROADCAST join on the pre-pass output instead: same two-job shape,
    // plan size independent of series cardinality. limit(inListMax+1)
    // picks the regime without a separate count job — getting back fewer
    // rows than the cap+1 means the list is complete.
    val counts = base.groupBy(col(SeriesCol)).count()
    val rawProbe = counts.filter(col("count") <= maxDataPoints)
      .select(col(SeriesCol)).limit(inListMax + 1).collect()
    def result(src: DataFrame, isRaw: Column, extraKeys: Seq[Column]): DataFrame =
      src
        .filter(isRaw || col(field).isNotNull) // mean side drops nulls pre-shuffle
        .groupBy(col(SeriesCol) +: extraKeys :+
          when(isRaw, col(TimeCol))
            .otherwise(col(TimeCol) - pmod(col(TimeCol), lit(w))).as(TimeCol): _*)
        .agg(first(col(field)).as("raw_v"),
          (TimeSeriesOps.sumExact2(col(field)) / count(col(field))).as("mean_v"),
          count(col(field)).as("n"))
        .select(col(SeriesCol), col(TimeCol),
          when(isRaw, col("raw_v").cast("double")).otherwise(col("mean_v")).as("v"),
          col("n"),
          when(isRaw, "raw").otherwise("mean").as("zoom_mode"))
    if (rawProbe.length <= inListMax) {
      val rawSeries = rawProbe.map(_.getString(0)).toSeq
      result(base, col(SeriesCol).isin(rawSeries: _*), Seq.empty)
    } else {
      val flags = counts
        .select(col(SeriesCol), (col("count") <= maxDataPoints).as("is_raw"))
      // is_raw is functionally dependent on the series, so adding it to
      // the grouping keys is free and makes it usable post-aggregate
      result(base.join(broadcast(flags), Seq(SeriesCol)),
        col("is_raw"), Seq(col("is_raw")))
    }
  }

  /** Windowed MIN/MAX zoom (reference grafana datasource.go:384-430). */
  def minMaxWindows(db: String, m: String, series: String, field: String,
                    t0: Long, t1: Long, windowWidth: Long): DataFrame =
    TimeSeriesOps.minMaxWindows(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, t0, t1, windowWidth)

  /** Trapezoidal integral (reference integral_op). Partial sums are
    * computed per STORAGE bucket (the op's bucketing aligns with the
    * engine's layout, so each task integrates the files it reads);
    * `valueDecimals` passes through to the op for order-independent exact
    * accumulation of fixed-precision fields. */
  def integrate(db: String, m: String, series: String, field: String,
                t0: Long, t1: Long, unitsPerSecond: Double = 1e9,
                valueDecimals: Option[Int] = None): DataFrame =
    TimeSeriesOps.integrate(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, t0, t1, unitsPerSecond,
      bucketWidth = bucketWidth, valueDecimals = valueDecimals)

  /** Multi-field trapezoidal integral — integral_op's field-LIST signature
    * (reference src/libtsdb/integral_op.cc:30-88): every requested field in
    * one timestamp walk. Empty fields list = all schema fields. */
  def integrateMulti(db: String, m: String, series: String, fields: Seq[String],
                     t0: Long, t1: Long, unitsPerSecond: Double = 1e9,
                     valueDecimals: Option[Int] = None): DataFrame = {
    val schema = getSchema(db, m)
    val fs = if (fields.isEmpty) schema.fields.map(_.name) else fields
    TimeSeriesOps.integrateMulti(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, fs, t0, t1, unitsPerSecond,
      bucketWidth = bucketWidth, valueDecimals = valueDecimals)
  }

  /** LIST ACTIVE SERIES: series with ≥1 visible point in range, with counts
    * (reference src/libtsdb/measurement.cc:49-63). */
  def listActiveSeries(db: String, m: String, t0: Long, t1: Long): DataFrame =
    TimeSeriesOps.activeSeries(visibleRange(db, m, t0, t1),
      SeriesCol, TimeCol, t0, t1)

  // -------------------------------------------------- value min-max index

  private def vindexDir(db: String, m: String, field: String) =
    new Path(measPath(db, m), s"_vindex/$field")

  /** Build (or rebuild) the per-(series, bucket) MIN/MAX sidecar for one
    * field — the engine's DATA-SKIPPING index for value predicates. The
    * reference's `index` file binary-searches TIME only
    * (src/libtsdb/select_op.cc:50-59); parquet footers do prune row groups
    * on values, but the planner still has to LIST and OPEN every bucket's
    * files to find that out — at 100 TB (millions of bucket dirs) the
    * listing/footer I/O is the cost, not the decode. This sidecar is one
    * aggregation job over the measurement producing bucket-count-scale
    * rows, so a selective value band later turns into a bucket IN-list and
    * prunes at the DIRECTORY level, before any file is opened.
    *
    * Staleness contract (what keeps every read correct under ANY index
    * age): each row carries the series' `time_last` AT BUILD TIME. Appends
    * are strictly monotone past `time_last` — the only other write shape
    * is the bitwise-identical tail replay, which changes no value — so
    * only buckets at/above `floorDiv(tl_at_build, bucketWidth)` can gain
    * data after the build. A value-pruned read therefore ALWAYS scans
    * those buckets regardless of their indexed min/max and only prunes
    * among strictly-older, immutable ones. Delete-from-front leaves index
    * rows for dropped buckets (they prune to empty dirs at scan time);
    * `compact` rewrites layout, never values. Same single-writer contract
    * as every other maintenance op (doc/LOCKING.txt).
    *
    * @return number of (series, bucket) entries indexed */
  def buildValueIndex(db: String, m: String, field: String): Long = {
    val schema = getSchema(db, m)
    if (!schema.fields.exists(_.name == field))
      throw new InvalidSchemaException(s"unknown field: $field")
    import spark.implicits._
    val wms = wmStore(db, m).load()
    val out = vindexDir(db, m, field)
    if (wms.isEmpty) { // nothing to index; an empty dir would confuse reads
      if (fs(out).exists(out)) fs(out).delete(out, true)
      return 0L
    }
    val wdf = wms.toSeq.map { case (s, r) => (s, r.timeLast) }
      .toDF(SeriesCol, "tl_at_build")
    val idx = readMeasurement(db, m, schema)
      .groupBy(col(SeriesCol), col(BucketCol))
      .agg(min(col(field)).as("vmin"), max(col(field)).as("vmax"))
      .join(broadcast(wdf), SeriesCol)
    // bucket-count-scale output: one small file keeps the read-side driver
    // lookup a single-footer operation
    idx.coalesce(1).write.mode("overwrite").parquet(out.toString)
    spark.read.parquet(out.toString).count()
  }

  /** INCREMENTAL maintenance of the value sidecar — the decay-prevention
    * path [[buildValueIndex]]'s staleness contract needs: appends past the
    * recorded watermark widen the always-scanned span until it overflows
    * [[MaxPrunedBuckets]] and pruning silently degrades to full scans
    * (observable via [[Tsdb.valueIndexStaleFallbacks]]). This refresh
    * re-aggregates ONLY buckets at/above each series' build watermark
    * (plus series the index has never seen), keeps the immutable rows
    * as-is, and advances `tl_at_build` — per-refresh cost scales with the
    * data appended since the last build, never the measurement (the
    * reference maintains its time index on every commit,
    * src/libtsdb/write.cc:36-447; a value index earns the same treatment).
    * Swap is delete+rename of the one-file sidecar: a crash between leaves
    * no index, and reads without an index are the plain (correct) scan.
    * @return total (series, bucket) entries after the refresh */
  def refreshValueIndex(db: String, m: String, field: String): Long = {
    val schema = getSchema(db, m)
    if (!schema.fields.exists(_.name == field))
      throw new InvalidSchemaException(s"unknown field: $field")
    val out = vindexDir(db, m, field)
    if (!fs(out).exists(out)) return buildValueIndex(db, m, field)
    import spark.implicits._
    val wms = wmStore(db, m).load()
    if (wms.isEmpty) { fs(out).delete(out, true); return 0L }
    // per-series mutable-bucket floor at the PREVIOUS build: driver-side,
    // series-count scale (same order as the watermark table itself)
    val staleLo = spark.read.parquet(out.toString)
      .groupBy(col(SeriesCol)).agg(min("tl_at_build").as("tl"))
      .collect().map(r => r.getString(0) ->
        Math.floorDiv(r.getLong(1), bucketWidth)).toMap
    // zero-row sidecar (e.g. built right after retention deleted every
    // bucket): nothing to keep or diff against — rebuild from scratch
    // instead of tripping over an empty stale map
    if (staleLo.isEmpty) { fs(out).delete(out, true)
      return buildValueIndex(db, m, field) }
    val oldSeries = staleLo.keys.toSeq
    val minStale = staleLo.values.min
    val staleDf = broadcast(staleLo.toSeq.toDF(SeriesCol, "_stale_lo"))
    val old = spark.read.parquet(out.toString)
      .select(col(SeriesCol), col(BucketCol), col("vmin"), col("vmax"))
      .join(staleDf, SeriesCol)
    val keepOld = old.filter(col(BucketCol) < col("_stale_lo"))
      .select(col(SeriesCol), col(BucketCol), col("vmin"), col("vmax"))
    val base = readMeasurement(db, m, schema)
    // literal predicates so the scan prunes statically: indexed series
    // from their global minimum stale bucket up (refined per series by the
    // broadcast join), never-indexed series in full
    val freshExisting = base
      .filter(col(SeriesCol).isin(oldSeries: _*) && col(BucketCol) >= minStale)
      .join(staleDf, SeriesCol)
      .filter(col(BucketCol) >= col("_stale_lo"))
      .select(base.columns.map(col): _*)
    val freshNew = base.filter(!col(SeriesCol).isin(oldSeries: _*))
    val fresh = freshExisting.unionByName(freshNew)
      .groupBy(col(SeriesCol), col(BucketCol))
      .agg(min(col(field)).as("vmin"), max(col(field)).as("vmax"))
    val wdf = wms.toSeq.map { case (s, r) => (s, r.timeLast) }
      .toDF(SeriesCol, "tl_at_build")
    // keepOld (bucket < stale_lo) and fresh (bucket >= stale_lo) are
    // disjoint by construction; the inner watermark join drops series
    // deleted since the last build
    val merged = keepOld.unionByName(fresh).join(broadcast(wdf), SeriesCol)
    val tmp = new Path(measPath(db, m), s"_vindex/.$field.refreshing")
    fs(tmp).delete(tmp, true)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    fs(out).delete(out, true)
    FileContext.getFileContext(out.toUri, hconf)
      .rename(tmp, out, Options.Rename.NONE)
    n
  }

  /** Bucket IN-list cap for value-pruned reads: past this the IN-expression
    * itself is the overhead and a bucket-range scan with the pushed value
    * filter is the better plan (constructor-tunable; see
    * [[Tsdb.DefaultMaxPrunedBuckets]]). */
  private val MaxPrunedBuckets = maxPrunedBuckets

  /** SELECT `(time_ns, field)` of one series in `[t0, t1]` with
    * `field ∈ [vLo, vHi]` — value-pruned to the buckets the min-max index
    * admits (see [[buildValueIndex]]). Without an index (or when the
    * IN-list would exceed [[MaxPrunedBuckets]]) this is the plain
    * bucket-range scan with the value filter pushed to parquet: identical
    * rows, no directory-level skipping. NULL field values never match the
    * band (SQL BETWEEN semantics), so an all-NULL bucket prunes too. */
  def selectValueRange(db: String, m: String, series: String, field: String,
                       vLo: Double, vHi: Double, t0: Long, t1: Long): DataFrame =
    selectValueRangeImpl(db, m, series, field, vLo, vHi, t0, t1,
      canAutoRefresh = autoRefreshValueIndex)

  private def selectValueRangeImpl(db: String, m: String, series: String,
                                   field: String, vLo: Double, vHi: Double,
                                   t0: Long, t1: Long,
                                   canAutoRefresh: Boolean): DataFrame = {
    val schema = getSchema(db, m)
    if (!schema.fields.exists(_.name == field))
      throw new InvalidSchemaException(s"unknown field: $field")
    val band = col(field).between(vLo, vHi)
    def proj(df: DataFrame): DataFrame = df.filter(band).select(TimeCol, field)
    val wm = seriesRange(db, m, series)
      .getOrElse(throw new NoSuchSeriesException(db, m, series))
    val (c0, c1) = (math.max(t0, wm.timeFirst), math.min(t1, wm.timeLast))
    if (c0 > c1) return proj(readMeasurement(db, m, schema).limit(0))
    val base = seriesData(db, m, series, schema, c0, c1)
    val ip = vindexDir(db, m, field)
    if (!fs(ip).exists(ip)) return proj(base)
    val (b0, b1) = (Math.floorDiv(c0, bucketWidth), Math.floorDiv(c1, bucketWidth))
    // driver-side lookup is index-row-scale for ONE series' bucket range —
    // the same order as the planner's own partition listing
    val rows = spark.read.parquet(ip.toString)
      .filter(col(SeriesCol) === series && col(BucketCol).between(b0, b1))
      .select(col(BucketCol), col("vmin").cast("double"),
        col("vmax").cast("double"), col("tl_at_build"))
      .collect()
    if (rows.isEmpty) return proj(base) // series newer than the index build
    val staleLo = Math.floorDiv(rows.head.getLong(3), bucketWidth)
    // an ancient index admits every post-build bucket unconditionally; once
    // that span alone overflows the IN-list cap, pruning cannot win — fall
    // back before materializing the range. OBSERVABLE, not silent: the
    // counter feeds the bench JSON, and refreshValueIndex is the cheap
    // restore path (it re-aggregates only post-watermark buckets).
    if (b1 - math.max(b0, staleLo) >= MaxPrunedBuckets) {
      Tsdb.valueIndexStaleFallbacks.incrementAndGet()
      // AUTO-HEAL (opt-in): the reference maintains its time index on
      // every commit (src/libtsdb/write.cc:36-447); here the read that
      // detects decay pays the (incremental, appended-data-scale) refresh
      // once and retries — later reads find a fresh index. One retry only.
      if (canAutoRefresh) {
        refreshValueIndex(db, m, field)
        return selectValueRangeImpl(db, m, series, field, vLo, vHi, t0, t1,
          canAutoRefresh = false)
      }
      return proj(base)
    }
    // indexed, immutable buckets whose [vmin, vmax] intersects the band —
    // the double casts above round ≤1 ulp, so widen by one ulp each way
    // rather than ever excluding a boundary bucket
    val matched = rows.iterator.filter { r =>
      r.getLong(0) < staleLo && !r.isNullAt(1) &&
        Math.nextUp(r.getDouble(2)) >= vLo && Math.nextDown(r.getDouble(1)) <= vHi
    }.map(_.getLong(0)).toSeq
    // every bucket the build could not have fully seen is always scanned
    val fresh = math.max(b0, staleLo) to b1
    val keep = (matched ++ fresh).distinct.sorted
    if (keep.size > MaxPrunedBuckets || keep.size.toLong == b1 - b0 + 1) proj(base)
    else proj(base.filter(col(BucketCol).isin(keep: _*)))
  }

  /** §2.3 client-side transforms (reference grafana datasource.go:257-268)
    * over the visible range of one series, server-side here: tare,
    * difference, derivative, and the reset-aware rate extension. All
    * bucket-parallel (see TimeSeriesOps). */
  def tare(db: String, m: String, series: String, field: String,
           t0: Long, t1: Long): DataFrame =
    TimeSeriesOps.tare(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, bucketWidth = bucketWidth)

  def difference(db: String, m: String, series: String, field: String,
                 t0: Long, t1: Long): DataFrame =
    TimeSeriesOps.difference(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, bucketWidth = bucketWidth)

  def derivative(db: String, m: String, series: String, field: String,
                 t0: Long, t1: Long, unitsPerSecond: Double = 1e9): DataFrame =
    TimeSeriesOps.derivative(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, unitsPerSecond, bucketWidth = bucketWidth)

  def rate(db: String, m: String, series: String, field: String,
           t0: Long, t1: Long, unitsPerSecond: Double = 1e9): DataFrame =
    TimeSeriesOps.rate(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, unitsPerSecond, bucketWidth = bucketWidth)

  /** Gap filling over the visible range: per-window mean plus LOCF and
    * linear-interpolation fills for empty windows (extension — see
    * TimeSeriesOps.gapFill). */
  def gapFill(db: String, m: String, series: String, field: String,
              t0: Long, t1: Long, windowWidth: Long): DataFrame =
    TimeSeriesOps.gapFill(visibleSeries(db, m, series, t0, t1),
      TimeCol, field, t0, t1, windowWidth)

  /** Per-series value histogram over the visible range (extension — see
    * TimeSeriesOps.histogram). */
  def histogram(db: String, m: String, series: String, field: String,
                t0: Long, t1: Long, binWidth: Double): DataFrame =
    TimeSeriesOps.histogram(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, field, binWidth)

  /** Exact per-series quantiles over the visible range (extension — see
    * TimeSeriesOps.quantiles: distributed counting sort, values picked not
    * interpolated). */
  def quantiles(db: String, m: String, series: String, field: String,
                t0: Long, t1: Long, qs: Seq[Double]): DataFrame =
    TimeSeriesOps.quantiles(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, field, qs)

  /** MAD-based anomaly flags over the visible range (extension — see
    * TimeSeriesOps.madOutliers: exact lower-median picks, no sketches). */
  def anomalies(db: String, m: String, series: String, field: String,
                t0: Long, t1: Long, k: Double): DataFrame =
    TimeSeriesOps.madOutliers(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, k)

  /** Batch sessionization of the visible range (extension — see
    * TimeSeriesOps.sessionize: bucket-parallel gaps-and-islands). */
  def sessionize(db: String, m: String, series: String, t0: Long, t1: Long,
                 gapUs: Long): DataFrame =
    TimeSeriesOps.sessionize(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series))
        .select(SeriesCol, TimeCol),
      SeriesCol, TimeCol, gapUs, bucketWidth = bucketWidth)

  /** LTTB-style visual downsample of the visible range (extension — see
    * TimeSeriesOps.lttbDownsample; unlike [[downsample]] this REDUCES for
    * a renderer rather than aggregating into a rollup measurement). */
  def lttb(db: String, m: String, series: String, field: String,
           t0: Long, t1: Long, bucketWidth: Long): DataFrame =
    TimeSeriesOps.lttbDownsample(
      visibleSeries(db, m, series, t0, t1).withColumn(SeriesCol, lit(series)),
      SeriesCol, TimeCol, field, bucketWidth)

  /** Downsample a series into a ROLLUP measurement: the windowed
    * sum/min/max/count aggregate (reference sum_op semantics incl. empty
    * windows) written back through the validated append path as a derived
    * measurement `<m>__rollup_<w>` — the standard TSDB rollup-table
    * workflow (dashboards zoom on the rollup, raw data keeps full
    * resolution; the reference computes sum_op on every query instead,
    * sum_op.cc:6-281). The rollup is a first-class measurement: same
    * layout, same catalog, same clamped reads, further downsample-able.
    * @return the rollup measurement name. */
  def downsample(db: String, m: String, series: String, field: String,
                 t0: Long, t1: Long, windowWidth: Long): String = {
    val rollup = Rollups.name(m, field, windowWidth)
    migrateLegacyRollup(db, m, field, windowWidth)
    createMeasurement(db, rollup, Rollups.Schema) // idempotent iff same schema
    val agg = sumWindows(db, m, series, field, t0, t1, windowWidth)
      .select(col("window_start").as(TimeCol),
        col("sum_value"), col("min_value"), col("max_value"), col("n"))
    writePoints(db, rollup, series, agg)
    rollup
  }

  /** One-time upgrade of a rollup measurement written under the pre-field
    * naming `<m>__rollup_<w>` (before the field joined the identity —
    * two fields' rollups collided on identical timestamps). The legacy name
    * does not record WHICH field produced it, so the rename happens only
    * when it is unambiguous: the parent schema has exactly one field and it
    * is the one being downsampled. Otherwise this fails LOUDLY — silently
    * creating a parallel measurement would leave readers of the legacy name
    * on stale data (the watermark-migration counterpart for rollups). */
  private def migrateLegacyRollup(db: String, m: String, field: String,
                                  windowWidth: Long): Unit = {
    val legacyName = s"${m}__rollup_$windowWidth"
    val legacy = measPath(db, legacyName)
    if (!fs(legacy).exists(legacy)) return
    val parentFields = getSchema(db, m).fields.map(_.name)
    if (parentFields == Seq(field)) {
      val target = measPath(db, Rollups.name(m, field, windowWidth))
      if (fs(target).exists(target))
        throw new MeasurementExistsException(db, legacyName,
          s"both legacy '$legacyName' and migrated '${target.getName}' exist; " +
          "remove one manually")
      // Hadoop rename reports most failures by RETURNING false, not
      // throwing — proceeding would create exactly the silent parallel
      // measurement this method exists to prevent
      require(fs(legacy).rename(legacy, target),
        s"migrating legacy rollup '$legacyName' -> '${target.getName}' failed")
      wmStores.remove((db, legacyName))
      wmStores.remove((db, target.getName))
    } else {
      // the ambiguity is WHICH field the legacy root belonged to — it can
      // only affect a field still waiting for migration. A field whose
      // correctly-named rollup already exists is unaffected (downsample
      // recomputes its windows from the parent either way), so it may
      // proceed; only fields without a migrated rollup stay blocked.
      // Trade-off, consciously taken: if the legacy root actually belonged
      // to THIS field and the parent raw data has since been retained
      // away, the legacy root's historical windows stay stranded under the
      // legacy name — recoverable any time by the same manual rename the
      // error below prescribes. The alternative (blocking every field
      // forever) was judged worse for the common case.
      val target = measPath(db, Rollups.name(m, field, windowWidth))
      if (fs(target).exists(target)) return
      throw new MeasurementExistsException(db, legacyName,
        s"legacy pre-field rollup '$legacyName' exists and measurement '$m' has " +
        s"fields ${parentFields.mkString(",")} — cannot infer its source field; " +
        s"rename it to '${m}__rollup_<field>_$windowWidth' (its actual source " +
        "field) before downsampling")
    }
  }

  // ---------------------------------------------------------------- paths/io

  private def dbPath(db: String) = new Path(root, db)
  private def measPath(db: String, m: String) = new Path(dbPath(db), m)
  private def schemaPath(db: String, m: String) = new Path(measPath(db, m), "_schema.json")
  private def metaDir(db: String, m: String) = new Path(measPath(db, m), "_meta")
  /** Append-intent marker: present iff an append is in flight (or died). */
  private def pendingPath(db: String, m: String, series: String) =
    // same Hive escaping as seriesDir: raw keys may hold ':' (a URI scheme
    // separator Hadoop Path rejects) and '%'/'#' (URI metacharacters)
    new Path(metaDir(db, m), "." + org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(series) + ".pending")
  private def dataDir(db: String, m: String) = new Path(measPath(db, m), "data")

  /** Canonical on-disk directory for one series' data. The name is
    * Hive-escaped EXACTLY like Spark's own partitioned writer would escape
    * it (ExternalCatalogUtils.escapePathName), so (a) writers and the
    * pruned reader agree on one physical path for keys holding '=', ':',
    * '%', '#' — typical of tag-encoded TSDB series — and (b) Spark's
    * partition-dir parser unescapes it back to the raw key on read, keeping
    * `col(series) === raw` predicates true. Plain names escape to
    * themselves, so pre-existing layouts are untouched. */
  private def seriesDir(db: String, m: String, series: String): Path =
    new Path(dataDir(db, m),
      s"$SeriesCol=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(series))

  /** One signature-cached watermark store per measurement (see
    * [[WatermarkStore]] for format, caching and the concurrency contract). */
  private val wmStores =
    scala.collection.concurrent.TrieMap.empty[(String, String), WatermarkStore]
  private def wmStore(db: String, m: String): WatermarkStore =
    wmStores.getOrElseUpdate((db, m), {
      val store = new WatermarkStore(new Path(measPath(db, m), "_wm"), hconf)
      migrateLegacyWatermarks(db, m, store)
      store
    })

  /** One-time upgrade of a root written by the earlier per-series layout
    * (`_meta/<series>.json`, one object per series): fold every legacy
    * watermark into the table, then remove the files. Without this, opening
    * an old root would silently show EMPTY measurements — and a subsequent
    * append would duplicate stored points under a fresh watermark. Table
    * entries win when both exist (the table is the newer store). */
  private def migrateLegacyWatermarks(db: String, m: String,
                                      store: WatermarkStore): Unit = {
    val md = metaDir(db, m)
    val f = fs(md)
    if (!f.exists(md)) return
    val legacy = f.listStatus(md).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".json") && !p.getName.startsWith("."))
    if (legacy.isEmpty) return
    val entries = legacy.map { p =>
      p.getName.stripSuffix(".json") -> SeriesRange.fromJson(readString(p))
    }.toMap
    val existing = store.load()
    store.update(entries.filter { case (sn, _) => !existing.contains(sn) })
    legacy.foreach(p => f.delete(p, false))
  }

  private def validName(s: String, what: String): Unit =
    if (s == null || !s.matches("[A-Za-z0-9_.-]{1,123}") || s.startsWith("_") ||
        s == "." || s == "..")
      throw new InvalidSchemaException(s"invalid $what name '$s'")

  /** Series names follow the REFERENCE's looser rule (series.cc:24-25:
    * reject only '/', ' ', '\\') — tag-encoded keys like
    * "host=web-01,dc=us" are legal series. Safe on disk because seriesDir
    * Hive-escapes the physical directory name; db/measurement names stay
    * strict (they name catalog paths and parquet column namespaces). */
  private def validSeriesName(s: String): Unit = {
    if (s == null || s.isEmpty || s.length > 123 ||
        s.exists(c => c == '/' || c == ' ' || c == '\\') ||
        s.startsWith("_") || s == "." || s == "..")
      throw new InvalidSchemaException(s"invalid series name '$s'")
    // the RAW bound is not enough: Hive escaping expands each special
    // char to %XX, and "series=" + escaped must stay under the 255-byte
    // filesystem component limit — fail LOUDLY here instead of an
    // ENAMETOOLONG mid-write that would leave a pending marker behind.
    // Measure BYTES, not UTF-16 chars: escapePathName passes >0x7F
    // through, so a 123-char non-ASCII name is up to ~369 bytes on disk.
    if (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(s).getBytes(java.nio.charset.StandardCharsets.UTF_8).length > 240)
      throw new InvalidSchemaException(
        s"series name escapes past the filesystem path-component limit: '$s'")
  }

  private def listDirs(p: Path): Seq[String] = {
    val f = fs(p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).sorted
  }

  private def readString(p: Path): String = StorageIO.readString(p, hconf)

  private def atomicWrite(p: Path, content: String): Unit =
    StorageIO.atomicWrite(p, content, hconf)
}

object Tsdb {
  /** 1 hour of nanoseconds — ~3.6 GB/bucket at 1M points/sec × 1 KB rows;
    * tune per deployment via the constructor (persisted like the reference's
    * `chunk_size`, src/libtsdb/constants.h:9). */
  val DefaultBucketWidth: Long = 3600L * 1000000000L

  /** zoomAll's regime switch: up to this many RAW-side series, the
    * dispatch decision is a literal In-list (no join in the data job);
    * beyond it, a broadcast semi-join on the count pre-pass output, so
    * plan/codegen size never grows with series cardinality. */
  val ZoomAllInListMax: Int = 1000
  /** Constructor sentinel: adopt the persisted width (or the default when
    * creating a new root) rather than requesting a specific one. */
  val UseExistingWidth: Long = Long.MinValue
  /** Batch size above which the append pays repartitionByRange's sampling
    * pass to split hot buckets across tasks; below it, hash-on-bucket. */
  val RangeWriteThreshold: Long = 32L * 1000 * 1000
  /** Hidden staging dirs of `compact` (leading dot: invisible to Spark's
    * file index, so readers never see half-written compaction output). */
  private[engine] val CompactTmp = ".compacting"
  private[engine] val CompactTrash = ".compact-trash"
  /** Default bucket IN-list cap for value-pruned reads (constructor
    * override exists mainly so specs can exercise the stale-span fallback
    * without writing thousands of buckets). */
  val DefaultMaxPrunedBuckets = 4096
  /** Process-wide count of value-pruned reads that fell back to a full
    * scan because the index's stale span overflowed the IN-list cap — the
    * "this index has decayed, run refreshValueIndex" signal (emitted into
    * the bench JSON; a silent decay at 100× append volume would otherwise
    * read as a plan regression). */
  val valueIndexStaleFallbacks = new java.util.concurrent.atomic.AtomicLong(0L)
}
