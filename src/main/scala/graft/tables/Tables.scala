package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * The `events` table carries ns-precision timestamps (parquet
  * TIMESTAMP(NANOS,false)). Spark reads those as `LongType` nanoseconds via
  * `spark.sql.legacy.parquet.nanosAsLong`, which conveniently matches the
  * reference's u64 `time_ns` model (reference:
  * src/libtsdb/measurement.h:22-31, doc/README.txt:107-109).
  *
  * DuckDB (the driver's oracle) reads the same column at µs precision, so
  * every oracle-compared query works on `time_us = ts div 1000`
  * (== DuckDB `epoch_us(ts)`); the engine itself stays ns-native.
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
    */
  def eventsTsdb(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").select(
      col("event_type").as("series"),
      col("ts").as("time_ns"),
      expr("ts div 1000").as("time_us"),
      col("event_id"), col("user_id"), col("value"))
}
