package graft.engine

/** Error taxonomy mirroring the reference's status codes (reference
  * src/libtsdb/exception.h:13-44) — each maps to the condition a client of
  * the reference would see. */
sealed abstract class TsdbException(msg: String) extends RuntimeException(msg)

final class NoSuchDatabaseException(db: String)
    extends TsdbException(s"no such database: $db")

final class NoSuchMeasurementException(db: String, m: String)
    extends TsdbException(s"no such measurement: $db/$m")

final class NoSuchSeriesException(db: String, m: String, series: String)
    extends TsdbException(s"no such series: $db/$m/$series")

/** CREATE MEASUREMENT with a different field set than the existing one
  * (re-creating with IDENTICAL fields is a no-op — reference
  * src/libtsdb/measurement.cc:96-111). */
final class MeasurementExistsException(db: String, m: String, detail: String)
    extends TsdbException(s"measurement exists with different schema: $db/$m ($detail)")

/** Invalid identifier / field list (reference src/libtsdb/measurement.cc:29-41,
  * max 64 fields constants.h:33, name length measurement.h:60). */
final class InvalidSchemaException(detail: String)
    extends TsdbException(s"invalid schema: $detail")

/** Batch violates strictly-increasing-timestamp rule: duplicate timestamps
  * within the batch, a NULL time_ns, or a never-before-seen point in the
  * already-committed past (reference src/libtsdb/wal.cc:63-68). */
final class OutOfOrderTimestampsException(detail: String)
    extends TsdbException(s"out-of-order timestamps: $detail")

/** Tail overwrite that is not bitwise identical to the stored points —
  * the whole write is rejected (reference src/libtsdb/wal.cc:87-246,
  * doc wal.h:288-295). */
final class OverwriteMismatchException(detail: String)
    extends TsdbException(s"tail overwrite mismatch: $detail")
