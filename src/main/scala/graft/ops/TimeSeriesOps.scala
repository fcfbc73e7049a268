package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's complete query-operator surface (SURVEY.md §2.1),
  * re-expressed as declarative DataFrame transforms so Catalyst handles
  * pruning / pushdown / codegen. All ops are time-unit agnostic: pass
  * `unitsPerSecond` (1e9 for ns-native engine tables, 1e6 for the
  * µs-normalized oracle queries).
  *
  * Scale notes (100 TB posture):
  *  - every op is a filter/agg/window over the time+series columns; with the
  *    storage layout partitioned by (series, time bucket) the scans prune to
  *    the touched partitions and the per-series window functions shuffle
  *    once on `series` (reference series are "embarrassingly parallel",
  *    doc/LOCKING.txt:3-8 — same property holds here: partition-by-series).
  *  - the window spine is generated distributed (`spark.range`), never on
  *    the driver.
  */
object TimeSeriesOps {

  /** Exact SUM over a fixed-2-decimal double column: aggregate in decimal so
    * the result is independent of partial-aggregation order (bitwise equal
    * across Spark/DuckDB), then surface as double. */
  def sumExact2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Op #1 (select_op_first, reference src/libtsdb/select_op.cc:175-231):
    * range scan [t0,t1] inclusive + projection + LIMIT, time-ascending.
    * `tiebreak` makes ordering total (the reference never needs one because
    * series timestamps are unique; a generic engine does). */
  def selectRange(df: DataFrame, tsCol: String, t0: Long, t1: Long,
                  projection: Seq[String], limit: Option[Int],
                  tiebreak: Seq[String] = Nil): DataFrame = {
    val ordered = df
      .filter(col(tsCol) >= t0 && col(tsCol) <= t1)
      .select(projection.map(col): _*)
      .orderBy((tsCol +: tiebreak).map(col): _*)
    limit.fold(ordered)(ordered.limit) // TakeOrderedAndProject when limited
  }

  /** Op #2 (select_op_last, reference src/libtsdb/select_op.cc:233-371):
    * last N points of the range, still emitted ascending. */
  def selectLast(df: DataFrame, tsCol: String, t0: Long, t1: Long, n: Int,
                 projection: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    val keys = tsCol +: tiebreak
    df.filter(col(tsCol) >= t0 && col(tsCol) <= t1)
      .select(projection.map(col): _*)
      .orderBy(keys.map(col(_).desc): _*)
      .limit(n)
      .orderBy(keys.map(col): _*)
  }

  /** Op #5 (count_points, reference src/libtsdb/count.cc:100-112):
    * (npoints, time_first, time_last) of the matching range. The reference
    * answers from index arithmetic; Parquet answers from row-group stats +
    * a single-column scan. */
  def countPoints(df: DataFrame, tsCol: String, t0: Long, t1: Long): DataFrame =
    df.filter(col(tsCol) >= t0 && col(tsCol) <= t1)
      .agg(count(lit(1)).as("npoints"),
           min(tsCol).as("time_first"),
           max(tsCol).as("time_last"))

  /** Op #12 (list_active_series, reference src/libtsdb/measurement.cc:49-63):
    * series with >= 1 point in range, with their counts. */
  def activeSeries(df: DataFrame, seriesCol: String, tsCol: String,
                   t0: Long, t1: Long): DataFrame =
    df.filter(col(tsCol) >= t0 && col(tsCol) <= t1)
      .groupBy(col(seriesCol).as("series")).agg(count(lit(1)).as("npoints"))
      .orderBy("series")

  /** First aligned window start: t0 rounded UP to a multiple of `w`
    * (reference src/libtsdb/sum_op.cc:9-10 — windows sit on absolute
    * multiples of window_ns). */
  def firstWindowStart(t0: Long, w: Long): Long = ((t0 + w - 1) / w) * w

  /** Number of COMPLETE windows inside [t0, t1]. */
  def numWindows(t0: Long, t1: Long, w: Long): Long = {
    val w0 = firstWindowStart(t0, w)
    if (t1 - w + 1 < w0) 0L else (t1 - w + 1 - w0) / w + 1
  }

  /** Op #6 (sum_op, reference src/libtsdb/sum_op.cc:6-281): tumbling windows
    * aligned to absolute multiples of `w`; per window emits sum / min / max /
    * non-null count; EMPTY windows inside the range ARE emitted (zero sum,
    * count 0 — the CLI prints `-`, reference src/tsdbcli2/main.cc:229-235).
    * Spine generated with spark.range (distributed; never a driver loop).
    */
  def sumWindows(df: DataFrame, tsCol: String, valCol: String,
                 t0: Long, t1: Long, w: Long): DataFrame = {
    val spark = df.sparkSession
    val w0 = firstWindowStart(t0, w)
    val nW = numWindows(t0, t1, w)
    val spine = spark.range(nW).select((lit(w0) + col("id") * w).as("window_start"))
    val agg = df
      .filter(col(tsCol) >= w0 && col(tsCol) < w0 + nW * w)
      .groupBy(((col(tsCol) - (col(tsCol) % w))).as("window_start"))
      .agg(sumExact2(col(valCol)).as("sum_value"),
           min(valCol).as("min_value"),
           max(valCol).as("max_value"),
           count(valCol).as("n"))
    spine.join(agg, Seq("window_start"), "left")
      .select(col("window_start"),
              coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
              col("min_value"), col("max_value"),
              coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("window_start")
  }

  /** Op #7 (MEAN, derived client-side in the reference:
    * src/tsdbcli2/main.cc:203-238 — sum/count of sum_op output). Non-empty
    * windows only, grouped per series. */
  def meanWindows(df: DataFrame, seriesCol: String, tsCol: String,
                  valCol: String, t0: Long, t1: Long, w: Long): DataFrame = {
    val w0 = firstWindowStart(t0, w)
    val nW = numWindows(t0, t1, w)
    df.filter(col(tsCol) >= w0 && col(tsCol) < w0 + nW * w)
      .groupBy(col(seriesCol).as("series"),
               (col(tsCol) - (col(tsCol) % w)).as("window_start"))
      .agg((sumExact2(col(valCol)) / count(valCol)).as("mean_value"),
           count(valCol).as("n"))
      .orderBy("series", "window_start")
  }

  /** Op #8 (min/max zoom, reference grafana datasource.go:384-430). */
  def minMaxWindows(df: DataFrame, seriesCol: String, tsCol: String,
                    valCol: String, t0: Long, t1: Long, w: Long): DataFrame = {
    val w0 = firstWindowStart(t0, w)
    val nW = numWindows(t0, t1, w)
    df.filter(col(tsCol) >= w0 && col(tsCol) < w0 + nW * w)
      .groupBy(col(seriesCol).as("series"),
               (col(tsCol) - (col(tsCol) % w)).as("window_start"))
      .agg(min(valCol).as("min_value"), max(valCol).as("max_value"),
           count(valCol).as("n"))
      .orderBy("series", "window_start")
  }

  /** Op #9 (integral_op, reference src/libtsdb/integral_op.cc:5-103):
    * trapezoidal integral over [t0,t1], dt in SECONDS; any NULL sample
    * poisons the result to NULL (integral_op.cc:48,84); 0 points -> no row
    * (reference: NULL); 1 point -> the value itself (integral_op.cc:96-102).
    * Also emits the actual first/last integrated timestamps so callers can
    * derive the time-average (reference src/tsdbcli2/main.cc:277-287).
    * Trapezoid terms (v + prev_v) * dt are accumulated EXACTLY in decimal
    * (values carry fixed 2-decimal precision; dt is integer), so the SUM is
    * independent of partial-aggregation order; the single final division by
    * 2*unitsPerSecond happens once in double. The full (unrounded) value is
    * returned — the reference returns the full double (integral_op.cc:84-88).
    */
  def integrate(df: DataFrame, seriesCol: String, tsCol: String,
                valCol: String, t0: Long, t1: Long,
                unitsPerSecond: Double, tiebreak: Seq[String] = Nil): DataFrame = {
    val ord = Window.partitionBy(seriesCol).orderBy((tsCol +: tiebreak).map(col): _*)
    val base = df.filter(col(tsCol) >= t0 && col(tsCol) <= t1)
      .select((seriesCol +: tsCol +: valCol +: tiebreak).distinct.map(col): _*)
      .withColumn("prev_v", lag(valCol, 1).over(ord))
      .withColumn("prev_t", lag(tsCol, 1).over(ord))
      .withColumn("term",
        (col(valCol).cast(DecimalType(18, 2)) + col("prev_v").cast(DecimalType(18, 2))) *
          (col(tsCol) - col("prev_t")))
    base.groupBy(col(seriesCol).as("series"))
      .agg(count(lit(1)).as("npoints"),
           min(tsCol).as("t0_out"),
           max(tsCol).as("t1_out"),
           max(col(valCol).isNull.cast("int")).as("any_null"),
           (sum("term").cast("double") / lit(2.0 * unitsPerSecond)).as("raw_integral"),
           min(valCol).as("only_value"))
      .select(col("series"), col("npoints"),
              col("t0_out"), col("t1_out"),
              when(col("any_null") === 1, lit(null))
                .when(col("npoints") === 1, col("only_value"))
                .otherwise(col("raw_integral")).as("integral"))
      .orderBy("series")
  }

  /** §2.3 client-side transforms (reference grafana datasource.go:257-268):
    * tare = v - first(v), difference = v - lag(v), derivative = dv/dt(sec).
    * All per-series ordered window functions. */
  private def orderedWindow(seriesCol: String, tsCol: String, tiebreak: Seq[String]) =
    Window.partitionBy(seriesCol).orderBy((tsCol +: tiebreak).map(col): _*)

  def tare(df: DataFrame, seriesCol: String, tsCol: String, valCol: String,
           tiebreak: Seq[String] = Nil): DataFrame = {
    val w = orderedWindow(seriesCol, tsCol, tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tare", col(valCol) - first(valCol).over(w))
  }

  def difference(df: DataFrame, seriesCol: String, tsCol: String, valCol: String,
                 tiebreak: Seq[String] = Nil): DataFrame =
    df.withColumn("difference",
      col(valCol) - lag(valCol, 1).over(orderedWindow(seriesCol, tsCol, tiebreak)))

  def derivative(df: DataFrame, seriesCol: String, tsCol: String, valCol: String,
                 unitsPerSecond: Double, tiebreak: Seq[String] = Nil): DataFrame = {
    val w = orderedWindow(seriesCol, tsCol, tiebreak)
    df.withColumn("derivative",
      (col(valCol) - lag(valCol, 1).over(w)) /
        ((col(tsCol) - lag(tsCol, 1).over(w)) / lit(unitsPerSecond)))
  }
}
