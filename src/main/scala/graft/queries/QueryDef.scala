package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible operator: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables. Column
  * names MUST match between the two — the driver sorts columns by name
  * before hashing values. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def withOracle(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Shared constants for the oracle-compared event queries. All times are
  * MICROSECONDS (DuckDB reads the parquet ns timestamps at µs precision;
  * see graft.tables.Tables). Events span 2024-01-01 .. 2024-01-31. */
object Params {
  val T0: Long = 1704500000000000L // 2024-01-06T00:13:20Z in µs
  val T1: Long = 1706000000000000L // 2024-01-23T08:53:20Z in µs
  val DAY: Long = 86400000000L     // 1 day in µs
  val CUT: Long = 1705000000000000L // delete-front watermark demo
  val UPS: Double = 1e6            // µs per second
}
