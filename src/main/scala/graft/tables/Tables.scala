package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * The `events` table's `ts` column has shipped in two physical forms across
  * driver generations: parquet TIMESTAMP(NANOS,false) — which Spark reads as
  * `LongType` nanoseconds under `spark.sql.legacy.parquet.nanosAsLong` — and
  * plain TIMESTAMP(MICROS,false), which Spark reads as TIMESTAMP_NTZ.
  * `eventsTsdb` normalizes EITHER form to the engine's u64 `time_ns` model
  * (reference: src/libtsdb/measurement.h:22-31, doc/README.txt:107-109), so
  * the rest of the codebase never sees the physical type.
  *
  * DuckDB (the driver's oracle) reads the same column as a timestamp, so
  * every oracle-compared query works on `time_us` (== DuckDB
  * `epoch_us(ts)`); the engine itself stays ns-native.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Assumes `spark.sql.legacy.parquet.nanosAsLong=true` was set at session
    * construction (Bench/Verify/tests do) — setting it here per-call would be
    * a hidden side effect and too late for some read paths. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` normalized to TSDB shape: `series` tag (reference series ==
    * tag string, doc/README.txt:24-26), ns + µs time columns, value fields.
    * Adapts to the physical `ts` type (ns-as-long vs µs timestamp) — see the
    * object Scaladoc. With the session timezone pinned to UTC the NTZ cast
    * is the identity instant mapping, matching DuckDB's `epoch_us`.
    */
  def eventsTsdb(spark: SparkSession, dir: String): DataFrame = {
    val ev = apply(spark, dir, "events")
    val (timeNs, timeUs) = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        (col("ts"), expr("ts div 1000"))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ at µs precision
        val us = unix_micros(col("ts").cast("timestamp"))
        (us * lit(1000L), us)
    }
    ev.select(
      col("event_type").as("series"),
      timeNs.as("time_ns"),
      timeUs.as("time_us"),
      col("event_id"), col("user_id"), col("value"))
  }
}
