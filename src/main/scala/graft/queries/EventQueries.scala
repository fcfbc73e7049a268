package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, TimeSeriesOps}
import graft.tables.Tables
import Params._

/** The reference's query surface (SURVEY.md §2.1 + §2.3) mapped onto the
  * driver's `events` table: series = event_type, time = ts. Every query has
  * a DuckDB oracle; time is µs-normalized (`epoch_us(ts)` == `ts div 1000`).
  */
object EventQueries {

  /** Common oracle SQL fragment: events normalized to TSDB shape. */
  private val EV =
    "(SELECT event_type AS series, epoch_us(ts) AS time_us, event_id, user_id, value FROM events)"

  val defs: Seq[QueryDef] = Seq(

    // Op #1: range scan + projection + LIMIT (select_op_first,
    // reference src/libtsdb/select_op.cc:175-231)
    QueryDef.withOracle("tsdb_select_range",
      s"""SELECT time_us, event_id, value FROM $EV
         |WHERE series = 'purchase' AND time_us BETWEEN $T0 AND $T1
         |ORDER BY time_us, event_id LIMIT 500""".stripMargin) { (s, dir) =>
      TimeSeriesOps.selectRange(
        Tables.eventsTsdb(s, dir).filter(col("series") === "purchase"),
        "time_us", T0, T1, Seq("time_us", "event_id", "value"),
        Some(500), Seq("event_id"))
    },

    // Op #2: LAST N of the range, emitted ascending (select_op_last,
    // reference src/libtsdb/select_op.cc:233-371)
    QueryDef.withOracle("tsdb_select_last",
      s"""SELECT * FROM (
         |  SELECT time_us, event_id, value FROM $EV
         |  WHERE series = 'purchase' AND time_us BETWEEN $T0 AND $T1
         |  ORDER BY time_us DESC, event_id DESC LIMIT 100
         |) ORDER BY time_us, event_id""".stripMargin) { (s, dir) =>
      TimeSeriesOps.selectLast(
        Tables.eventsTsdb(s, dir).filter(col("series") === "purchase"),
        "time_us", T0, T1, 100, Seq("time_us", "event_id", "value"), Seq("event_id"))
    },

    // Op #5: count + live range (count_points,
    // reference src/libtsdb/count.cc:100-112)
    QueryDef.withOracle("tsdb_count",
      s"""SELECT count(*) AS npoints, min(time_us) AS time_first,
         |       max(time_us) AS time_last FROM $EV
         |WHERE series = 'click' AND time_us BETWEEN $T0 AND $T1""".stripMargin) { (s, dir) =>
      TimeSeriesOps.countPoints(
        Tables.eventsTsdb(s, dir).filter(col("series") === "click"),
        "time_us", T0, T1)
    },

    // Op #12: active series in range
    // (reference src/libtsdb/measurement.cc:49-63)
    QueryDef.withOracle("tsdb_active_series",
      s"""SELECT series, count(*) AS npoints FROM $EV
         |WHERE time_us BETWEEN $T0 AND $T1
         |GROUP BY series ORDER BY series""".stripMargin) { (s, dir) =>
      TimeSeriesOps.activeSeries(Tables.eventsTsdb(s, dir), "series", "time_us", T0, T1)
    },

    // Op #6: tumbling-window sum/min/max/count INCLUDING empty windows
    // (sum_op, reference src/libtsdb/sum_op.cc:6-281; empty-window emission
    // src/tsdbcli2/main.cc:229-235)
    QueryDef.withOracle("tsdb_window_sum", {
      val w0 = TimeSeriesOps.firstWindowStart(T0, DAY)
      val nW = TimeSeriesOps.numWindows(T0, T1, DAY)
      s"""WITH spine AS (
         |  SELECT unnest(generate_series($w0, ${w0 + (nW - 1) * DAY}, $DAY)) AS window_start
         |), agg AS (
         |  SELECT time_us - (time_us % $DAY) AS window_start,
         |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |         MIN(value) AS min_value, MAX(value) AS max_value,
         |         COUNT(value) AS n
         |  FROM $EV
         |  WHERE series = 'click' AND time_us >= $w0 AND time_us < ${w0 + nW * DAY}
         |  GROUP BY 1
         |)
         |SELECT s.window_start, coalesce(a.sum_value, 0.0) AS sum_value,
         |       a.min_value, a.max_value, coalesce(a.n, 0) AS n
         |FROM spine s LEFT JOIN agg a USING (window_start)
         |ORDER BY window_start""".stripMargin
    }) { (s, dir) =>
      TimeSeriesOps.sumWindows(
        Tables.eventsTsdb(s, dir).filter(col("series") === "click"),
        "time_us", "value", T0, T1, DAY)
    },

    // Op #7: windowed MEAN (derived sum/count, reference
    // src/tsdbcli2/main.cc:203-238), per series, non-empty windows
    QueryDef.withOracle("tsdb_window_mean", {
      val w0 = TimeSeriesOps.firstWindowStart(T0, DAY)
      val hi = w0 + TimeSeriesOps.numWindows(T0, T1, DAY) * DAY
      s"""SELECT series, time_us - (time_us % $DAY) AS window_start,
         |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS mean_value,
         |       COUNT(value) AS n
         |FROM $EV WHERE time_us >= $w0 AND time_us < $hi
         |GROUP BY 1, 2 ORDER BY series, window_start""".stripMargin
    }) { (s, dir) =>
      TimeSeriesOps.meanWindows(Tables.eventsTsdb(s, dir),
        "series", "time_us", "value", T0, T1, DAY)
    },

    // Op #8: windowed MIN/MAX zoom (reference grafana datasource.go:384-430)
    QueryDef.withOracle("tsdb_window_minmax", {
      val w0 = TimeSeriesOps.firstWindowStart(T0, DAY)
      val hi = w0 + TimeSeriesOps.numWindows(T0, T1, DAY) * DAY
      s"""SELECT series, time_us - (time_us % $DAY) AS window_start,
         |       MIN(value) AS min_value, MAX(value) AS max_value,
         |       COUNT(value) AS n
         |FROM $EV WHERE time_us >= $w0 AND time_us < $hi
         |GROUP BY 1, 2 ORDER BY series, window_start""".stripMargin
    }) { (s, dir) =>
      TimeSeriesOps.minMaxWindows(Tables.eventsTsdb(s, dir),
        "series", "time_us", "value", T0, T1, DAY)
    },

    // Op #9: trapezoidal integral, dt in seconds, per series
    // (integral_op, reference src/libtsdb/integral_op.cc:5-103)
    QueryDef.withOracle("tsdb_integral",
      s"""WITH base AS (
         |  SELECT series, time_us, value,
         |         lag(value) OVER w AS prev_v,
         |         lag(time_us) OVER w AS prev_t
         |  FROM $EV WHERE time_us BETWEEN $T0 AND $T1
         |  WINDOW w AS (PARTITION BY series ORDER BY time_us, event_id)
         |)
         |SELECT series, count(*) AS npoints,
         |       min(time_us) AS t0_out, max(time_us) AS t1_out,
         |       CASE WHEN max(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 1 THEN NULL
         |            WHEN count(*) = 1 THEN min(value)
         |            ELSE CAST(CAST(sum((CAST(value AS DECIMAL(18,2)) + CAST(prev_v AS DECIMAL(18,2)))
         |                          * (time_us - prev_t)) * 100 AS BIGINT) AS DOUBLE) / 200000000.0
         |       END AS integral
         |FROM base GROUP BY series ORDER BY series""".stripMargin) { (s, dir) =>
      // valueDecimals=2: the events `value` column carries fixed 2-decimal
      // precision, so decimal accumulation makes the sum independent of
      // partial-aggregation order (bitwise equal to the decimal oracle).
      // The op itself defaults to full-double accumulation.
      TimeSeriesOps.integrate(Tables.eventsTsdb(s, dir),
        "series", "time_us", "value", T0, T1, UPS, Seq("event_id"),
        bucketWidth = DAY, valueDecimals = Some(2))
    },

    // Op #9 with a field LIST (the reference's actual signature — INTEGRATE
    // f1,f2 FROM …, integral_op.cc:30-88): two fields integrated in ONE
    // timestamp walk, per-field NULL-poisoning. Second field derived
    // (floor(value), i64) so the cast/widening path is exercised too.
    QueryDef.withOracle("tsdb_integral_multi",
      s"""WITH base AS (
         |  SELECT series, time_us, value,
         |         CAST(floor(value) AS BIGINT) AS whole,
         |         lag(value) OVER w AS prev_v,
         |         lag(CAST(floor(value) AS BIGINT)) OVER w AS prev_w,
         |         lag(time_us) OVER w AS prev_t
         |  FROM $EV WHERE time_us BETWEEN $T0 AND $T1
         |  WINDOW w AS (PARTITION BY series ORDER BY time_us, event_id)
         |)
         |SELECT series, count(*) AS npoints,
         |       min(time_us) AS t0_out, max(time_us) AS t1_out,
         |       CASE WHEN max(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 1 THEN NULL
         |            WHEN count(*) = 1 THEN min(value)
         |            ELSE CAST(CAST(sum((CAST(value AS DECIMAL(18,2)) + CAST(prev_v AS DECIMAL(18,2)))
         |                          * (time_us - prev_t)) * 100 AS BIGINT) AS DOUBLE) / 200000000.0
         |       END AS integral_value,
         |       CASE WHEN max(CASE WHEN whole IS NULL THEN 1 ELSE 0 END) = 1 THEN NULL
         |            WHEN count(*) = 1 THEN min(whole)
         |            ELSE CAST(CAST(sum((CAST(whole AS DECIMAL(18,2)) + CAST(prev_w AS DECIMAL(18,2)))
         |                          * (time_us - prev_t)) * 100 AS BIGINT) AS DOUBLE) / 200000000.0
         |       END AS integral_whole
         |FROM base GROUP BY series ORDER BY series""".stripMargin) { (s, dir) =>
      TimeSeriesOps.integrateMulti(
        Tables.eventsTsdb(s, dir).withColumn("whole", floor(col("value"))),
        "series", "time_us", Seq("value", "whole"), T0, T1, UPS, Seq("event_id"),
        bucketWidth = DAY, valueDecimals = Some(2))
    },

    // §2.3 Tare: v - first(v) per series (reference datasource.go:257-268)
    QueryDef.withOracle("tsdb_tare",
      s"""SELECT series, time_us, event_id,
         |       value - first_value(value) OVER
         |         (PARTITION BY series ORDER BY time_us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tare
         |FROM $EV WHERE time_us BETWEEN $T0 AND $T1
         |ORDER BY series, time_us, event_id""".stripMargin) { (s, dir) =>
      val base = Tables.eventsTsdb(s, dir)
        .filter(col("time_us") >= T0 && col("time_us") <= T1)
      TimeSeriesOps.tare(base, "series", "time_us", "value", Seq("event_id"), DAY)
        .select("series", "time_us", "event_id", "tare")
        .orderBy("series", "time_us", "event_id")
    },

    // §2.3 Difference: v - lag(v) per series
    QueryDef.withOracle("tsdb_difference",
      s"""SELECT series, time_us, event_id,
         |       value - lag(value) OVER
         |         (PARTITION BY series ORDER BY time_us, event_id) AS difference
         |FROM $EV WHERE time_us BETWEEN $T0 AND $T1
         |ORDER BY series, time_us, event_id""".stripMargin) { (s, dir) =>
      val base = Tables.eventsTsdb(s, dir)
        .filter(col("time_us") >= T0 && col("time_us") <= T1)
      TimeSeriesOps.difference(base, "series", "time_us", "value", Seq("event_id"), DAY)
        .select("series", "time_us", "event_id", "difference")
        .orderBy("series", "time_us", "event_id")
    },

    // §2.3 Derivative per second
    QueryDef.withOracle("tsdb_derivative",
      s"""SELECT series, time_us, event_id,
         |       (value - lag(value) OVER w) /
         |         ((time_us - lag(time_us) OVER w) / 1000000.0) AS derivative
         |FROM $EV WHERE time_us BETWEEN $T0 AND $T1
         |WINDOW w AS (PARTITION BY series ORDER BY time_us, event_id)
         |ORDER BY series, time_us, event_id""".stripMargin) { (s, dir) =>
      val base = Tables.eventsTsdb(s, dir)
        .filter(col("time_us") >= T0 && col("time_us") <= T1)
      TimeSeriesOps.derivative(base, "series", "time_us", "value", UPS, Seq("event_id"), DAY)
        .select("series", "time_us", "event_id", "derivative")
        .orderBy("series", "time_us", "event_id")
    },

    // EXTENSION: backward as-of join (the reference has no joins at all,
    // SURVEY §2.4 — this is the cross-series alignment every TSDB user
    // reaches for). Canonical per-series points (min value per µs) so both
    // engines see identical inputs; DuckDB's native ASOF JOIN is the
    // oracle. Value picking only -> bitwise-stable.
    QueryDef.withOracle("tsdb_asof_join",
      s"""WITH pts AS (SELECT series, time_us, min(value) AS v
         |            FROM $EV GROUP BY 1, 2),
         |c AS (SELECT time_us, v AS click_v FROM pts WHERE series = 'click'),
         |p AS (SELECT time_us, v FROM pts WHERE series = 'purchase')
         |SELECT c.time_us, c.click_v, p.time_us AS asof_time, p.v AS asof_v
         |FROM c ASOF LEFT JOIN p ON c.time_us >= p.time_us
         |ORDER BY c.time_us""".stripMargin) { (s, dir) =>
      val pts = Tables.eventsTsdb(s, dir)
        .groupBy("series", "time_us").agg(min("value").as("v"))
      val clicks = pts.filter(col("series") === "click")
        .select(col("time_us"), col("v").as("click_v"))
      val purchases = pts.filter(col("series") === "purchase")
        .select("time_us", "v")
      TimeSeriesOps.asofJoin(clicks, purchases, "time_us", "v", bucketWidth = DAY)
        .select(col("time_us"), col("click_v"), col("asof_time"), col("asof_v"))
        .orderBy("time_us")
    },

    // EXTENSION: bucketed range join — per click, count/max of purchases in
    // the trailing 6 h window. Both sides shuffle once on day buckets (2×
    // right fan-out), never a nested-loop theta join; count/max are
    // order-independent so the match is bitwise. Oracle = the plain
    // inequality join DuckDB executes directly.
    QueryDef.withOracle("tsdb_range_join",
      s"""WITH pts AS (SELECT series, time_us, min(value) AS v
         |            FROM $EV GROUP BY 1, 2),
         |c AS (SELECT time_us, v AS click_v FROM pts WHERE series = 'click'),
         |p AS (SELECT time_us, v FROM pts WHERE series = 'purchase')
         |SELECT c.time_us, c.click_v,
         |       count(p.time_us) AS n_in_window,
         |       max(p.v) AS max_in_window
         |FROM c LEFT JOIN p
         |  ON p.time_us BETWEEN c.time_us - ${6 * 3600000000L} AND c.time_us
         |GROUP BY c.time_us, c.click_v
         |ORDER BY c.time_us""".stripMargin) { (s, dir) =>
      val pts = Tables.eventsTsdb(s, dir)
        .groupBy("series", "time_us").agg(min("value").as("v"))
      val clicks = pts.filter(col("series") === "click")
        .select(col("time_us"), col("v").as("click_v"))
      val purchases = pts.filter(col("series") === "purchase")
        .select("time_us", "v")
      TimeSeriesOps.rangeJoinAgg(clicks, purchases, "time_us", "v",
          lookback = 6 * 3600000000L, bucketWidth = DAY)
        .orderBy("time_us")
    },

    // §2.3 Series="All" fan-out as ONE plan (reference grafana
    // datasource.go:209-221 loops one query per active series; here a
    // single query does the whole measurement): LAST 20 of the range for
    // EVERY series, ascending per series. Two-phase top-N — a direct
    // whole-series window would be one task per series (the 5-task
    // ceiling): phase 1 keeps 20 candidates per (series, day-bucket) in
    // bucket-parallel windows; phase 2 ranks the candidate table, which is
    // (series × buckets × 20)-sized, not data-sized.
    QueryDef.withOracle("tsdb_last_all_series",
      s"""SELECT series, time_us, event_id, value FROM (
         |  SELECT series, time_us, event_id, value,
         |    row_number() OVER (PARTITION BY series
         |      ORDER BY time_us DESC, event_id DESC) AS rn
         |  FROM $EV WHERE time_us BETWEEN $T0 AND $T1)
         |WHERE rn <= 20 ORDER BY series, time_us, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val key = Seq(col("time_us").desc, col("event_id").desc)
      val wb = Window.partitionBy(col("series"), expr(s"time_us div $DAY"))
        .orderBy(key: _*)
      val ws = Window.partitionBy("series").orderBy(key: _*)
      Tables.eventsTsdb(s, dir)
        .filter(col("time_us").between(T0, T1))
        .withColumn("rn", row_number().over(wb))
        .filter(col("rn") <= 20) // bucket-parallel candidate pruning
        .withColumn("rn", row_number().over(ws)) // candidate-scale final rank
        .filter(col("rn") <= 20)
        .select("series", "time_us", "event_id", "value")
        .orderBy("series", "time_us", "event_id")
    },

    // EXTENSION: VALUE-space top-K per series (§2.4 notes the reference has
    // top-K only as time-ordered LIMIT/LAST — "the 10 largest readings" is
    // the other top-K every dashboard wants). Same two-phase shape as
    // tsdb_last_all_series, ranking by (value desc, time, event_id): phase 1
    // prunes candidates in bucket-parallel windows, phase 2 ranks the
    // candidate-scale table — never one whole-series task.
    QueryDef.withOracle("tsdb_topk_by_value",
      s"""SELECT series, time_us, event_id, value FROM (
         |  SELECT series, time_us, event_id, value,
         |    row_number() OVER (PARTITION BY series
         |      ORDER BY value DESC, time_us, event_id) AS rn
         |  FROM $EV WHERE time_us BETWEEN $T0 AND $T1)
         |WHERE rn <= 10 ORDER BY series, value DESC, time_us, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val key = Seq(col("value").desc, col("time_us").asc, col("event_id").asc)
      val wb = Window.partitionBy(col("series"), expr(s"time_us div $DAY"))
        .orderBy(key: _*)
      val ws = Window.partitionBy("series").orderBy(key: _*)
      Tables.eventsTsdb(s, dir)
        .filter(col("time_us").between(T0, T1))
        .withColumn("rn", row_number().over(wb))
        .filter(col("rn") <= 10) // bucket-parallel candidate pruning
        .withColumn("rn", row_number().over(ws)) // candidate-scale final rank
        .filter(col("rn") <= 10)
        .select("series", "time_us", "event_id", "value")
        .orderBy(col("series"), col("value").desc, col("time_us"), col("event_id"))
    },

    // EXTENSION: SLIDING windows (2-day width, 12-hour slide — overlap 4).
    // Tumbling is the reference's only window shape; overlapping zoom is
    // what dashboards actually draw. The oracle forms the same windows with
    // an inequality join against the spine.
    QueryDef.withOracle("tsdb_window_sliding", {
      val W = 2 * DAY
      val S = DAY / 2
      val s0 = graft.ops.TimeSeriesOps.firstWindowStart(T0, S)
      val nW = (T1 - W + 1 - s0) / S + 1
      s"""WITH spine AS (
         |  SELECT unnest(generate_series($s0, ${s0 + (nW - 1) * S}, $S)) AS window_start
         |), agg AS (
         |  SELECT s.window_start,
         |         CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |         MIN(p.value) AS min_value, MAX(p.value) AS max_value,
         |         COUNT(p.value) AS n
         |  FROM spine s JOIN (SELECT time_us, value FROM $EV WHERE series = 'click') p
         |    ON p.time_us >= s.window_start AND p.time_us < s.window_start + $W
         |  GROUP BY 1
         |)
         |SELECT s.window_start, coalesce(a.sum_value, 0.0) AS sum_value,
         |       a.min_value, a.max_value, coalesce(a.n, 0) AS n
         |FROM spine s LEFT JOIN agg a USING (window_start)
         |ORDER BY window_start""".stripMargin
    }) { (s, dir) =>
      TimeSeriesOps.slidingWindows(
        Tables.eventsTsdb(s, dir).filter(col("series") === "click"),
        "time_us", "value", T0, T1, w = 2 * DAY, slide = DAY / 2)
    },

    // EXTENSION: batch sessionization — activity bursts per series split at
    // >5 min silence (gaps-and-islands). The oracle is the classic two-
    // window SQL; the Spark side is bucket-parallel with island-level merge
    // (see TimeSeriesOps.sessionize). Distinct timestamps so window tie
    // order can't differ between engines.
    QueryDef.withOracle("tsdb_sessionize",
      s"""WITH pts AS (SELECT DISTINCT series, time_us FROM $EV),
         |m AS (
         |  SELECT series, time_us,
         |    CASE WHEN lag(time_us) OVER w IS NULL
         |           OR time_us - lag(time_us) OVER w > ${5 * 60000000L}
         |         THEN 1 ELSE 0 END AS s
         |  FROM pts WINDOW w AS (PARTITION BY series ORDER BY time_us)),
         |g AS (SELECT series, time_us,
         |        sum(s) OVER (PARTITION BY series ORDER BY time_us
         |                     ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM m)
         |SELECT series, min(time_us) AS session_start,
         |       max(time_us) AS session_end, count(*) AS n
         |FROM g GROUP BY series, sid
         |ORDER BY series, session_start""".stripMargin) { (s, dir) =>
      TimeSeriesOps.sessionize(
        Tables.eventsTsdb(s, dir).select("series", "time_us").distinct(),
        "series", "time_us", gapUs = 5 * 60000000L, bucketWidth = DAY)
    },

    // EXTENSION: counter-reset-aware RATE (Prometheus semantics) — the
    // production form of the reference's client-side derivative
    // (datasource.go:257-268): a counter restart must not produce a huge
    // negative spike. Same bucket-parallel lag shape as tsdb_derivative.
    QueryDef.withOracle("tsdb_rate",
      s"""SELECT series, time_us, event_id,
         |       (CASE WHEN value >= lag(value) OVER w THEN value - lag(value) OVER w
         |             ELSE value END) /
         |         ((time_us - lag(time_us) OVER w) / 1000000.0) AS rate
         |FROM $EV WHERE time_us BETWEEN $T0 AND $T1
         |WINDOW w AS (PARTITION BY series ORDER BY time_us, event_id)
         |ORDER BY series, time_us, event_id""".stripMargin) { (s, dir) =>
      val base = Tables.eventsTsdb(s, dir)
        .filter(col("time_us") >= T0 && col("time_us") <= T1)
      TimeSeriesOps.rate(base, "series", "time_us", "value", UPS, Seq("event_id"), DAY)
        .select("series", "time_us", "event_id", "rate")
        .orderBy("series", "time_us", "event_id")
    },

    // EXTENSION: GAP FILLING — LOCF + linear interpolation over empty
    // windows (InfluxDB fill(previous|linear), Timescale locf/interpolate;
    // the reference just emits empty windows and leaves holes in the
    // dashboard). 30-min windows on the sparse 'error' series leave ~24%
    // of windows empty at sf0.01 — both fill policies are exercised for
    // real. The sequential passes run over the window spine, never points.
    QueryDef.withOracle("tsdb_gap_fill", {
      val W = 1800000000L // 30 min of µs
      val w0 = TimeSeriesOps.firstWindowStart(T0, W)
      val nW = TimeSeriesOps.numWindows(T0, T1, W)
      s"""WITH spine AS (
         |  SELECT unnest(generate_series($w0, ${w0 + (nW - 1) * W}, $W)) AS window_start
         |), agg AS (
         |  SELECT time_us - (time_us % $W) AS window_start,
         |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS mean_value,
         |         COUNT(value) AS n
         |  FROM $EV
         |  WHERE series = 'error' AND time_us >= $w0 AND time_us < ${w0 + nW * W}
         |  GROUP BY 1
         |), j AS (
         |  SELECT s.window_start, coalesce(a.n, 0) AS n, a.mean_value
         |  FROM spine s LEFT JOIN agg a USING (window_start)
         |), f AS (
         |  SELECT window_start, n, mean_value,
         |    last_value(mean_value IGNORE NULLS) OVER wa AS pv,
         |    last_value(CASE WHEN mean_value IS NOT NULL THEN window_start END IGNORE NULLS)
         |      OVER wa AS pw,
         |    first_value(mean_value IGNORE NULLS) OVER wd AS nv,
         |    first_value(CASE WHEN mean_value IS NOT NULL THEN window_start END IGNORE NULLS)
         |      OVER wd AS nw
         |  FROM j
         |  WINDOW wa AS (ORDER BY window_start ROWS UNBOUNDED PRECEDING),
         |         wd AS (ORDER BY window_start
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT window_start, n, mean_value, pv AS locf_value,
         |       CASE WHEN mean_value IS NOT NULL THEN mean_value
         |            WHEN pv IS NULL THEN nv
         |            WHEN nv IS NULL THEN pv
         |            ELSE pv + (nv - pv) * ((window_start - pw) / (nw - pw))
         |       END AS linear_value
         |FROM f ORDER BY window_start""".stripMargin
    }) { (s, dir) =>
      TimeSeriesOps.gapFill(
        Tables.eventsTsdb(s, dir).filter(col("series") === "error"),
        "time_us", "value", T0, T1, 1800000000L)
    },

    // EXTENSION: per-series value histogram (fixed 10.0-wide bins). The
    // reference has no value-space operators (SURVEY §2.4); dashboards need
    // the distribution zoom. One hash agg on (series, bin) — shuffle rows =
    // occupied bins, never points. floor(v/10.0) is safe for the bitwise
    // oracle: bin boundaries (multiples of 10) are exact doubles.
    QueryDef.withOracle("tsdb_histogram",
      s"""SELECT series, CAST(floor(value / 10.0) AS BIGINT) AS bin,
         |       count(*) AS n, min(value) AS min_v, max(value) AS max_v
         |FROM $EV WHERE value IS NOT NULL AND time_us BETWEEN $T0 AND $T1
         |GROUP BY 1, 2 ORDER BY series, bin""".stripMargin) { (s, dir) =>
      TimeSeriesOps.histogram(
        Tables.eventsTsdb(s, dir).filter(col("time_us").between(T0, T1)),
        "series", "value", binWidth = 10.0)
    },

    // EXTENSION: exact per-series quantiles by distributed counting sort
    // (see TimeSeriesOps.quantiles — per-series sort would be a 5-task
    // ceiling; sketches are approximate). "Lower" interpolation picks a
    // stored value, so the oracle matches bitwise.
    QueryDef.withOracle("tsdb_quantile",
      s"""WITH pts AS (
         |  SELECT series, value AS v FROM $EV
         |  WHERE value IS NOT NULL AND time_us BETWEEN $T0 AND $T1),
         |cnt AS (SELECT series, v, count(*) AS c FROM pts GROUP BY 1, 2),
         |cum AS (SELECT series, v, c,
         |          sum(c) OVER (PARTITION BY series ORDER BY v
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM cnt),
         |tot AS (SELECT series, sum(c) AS n FROM cnt GROUP BY 1),
         |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
         |SELECT c.series, qs.q, c.v AS quantile_value
         |FROM cum c JOIN tot USING (series) CROSS JOIN qs
         |WHERE c.cum >= CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
         |  AND c.cum - c.c < CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
         |ORDER BY series, q""".stripMargin) { (s, dir) =>
      TimeSeriesOps.quantiles(
        Tables.eventsTsdb(s, dir).filter(col("time_us").between(T0, T1)),
        "series", "value", Seq(0.5, 0.9, 0.99))
    },

    // EXTENSION: per-series WINSORIZATION (the robust-stats clamp sensor
    // pipelines run before aggregation — a stuck gauge's spikes poison a
    // plain mean): exact p05/p95 per series through the SAME distributed
    // counting-sort quantiles as tsdb_quantile ("lower" interpolation —
    // bounds are stored values, so the oracle matches bitwise), bounds
    // broadcast back, every value clamped map-side, the winsorized mean
    // kept DECIMAL-exact until the one final double division.
    QueryDef.withOracle("tsdb_winsorize",
      s"""WITH pts AS (
         |  SELECT series, value AS v FROM $EV
         |  WHERE value IS NOT NULL AND time_us BETWEEN $T0 AND $T1),
         |cnt AS (SELECT series, v, count(*) AS c FROM pts GROUP BY 1, 2),
         |cum AS (SELECT series, v, c,
         |          sum(c) OVER (PARTITION BY series ORDER BY v
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM cnt),
         |tot AS (SELECT series, sum(c) AS n FROM cnt GROUP BY 1),
         |qs AS (SELECT unnest([0.05, 0.95]) AS q),
         |qv AS (SELECT c.series, qs.q, c.v
         |       FROM cum c JOIN tot USING (series) CROSS JOIN qs
         |       WHERE c.cum >= CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
         |         AND c.cum - c.c < CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1),
         |b AS (SELECT series, MIN(CASE WHEN q = 0.05 THEN v END) AS lo,
         |        MAX(CASE WHEN q = 0.95 THEN v END) AS hi
         |      FROM qv GROUP BY 1),
         |cl AS (SELECT p.series, b.lo, b.hi,
         |         greatest(b.lo, least(b.hi, p.v)) AS cv,
         |         CASE WHEN p.v < b.lo THEN 1 ELSE 0 END AS il,
         |         CASE WHEN p.v > b.hi THEN 1 ELSE 0 END AS ih
         |       FROM pts p JOIN b USING (series))
         |SELECT series, lo, hi, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(il) AS BIGINT) AS n_clamped_low,
         |  CAST(sum(ih) AS BIGINT) AS n_clamped_high,
         |  CAST(SUM(CAST(cv AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         |    AS mean_winsorized
         |FROM cl GROUP BY series, lo, hi ORDER BY series""".stripMargin) {
      (s, dir) =>
      val pts = Tables.eventsTsdb(s, dir)
        .filter(col("value").isNotNull && col("time_us").between(T0, T1))
        .select(col("series"), col("value").as("v"))
      val bounds = TimeSeriesOps.quantiles(pts, "series", "v",
          Seq(0.05, 0.95))
        .groupBy("series")
        .agg(min(when(col("q") === 0.05, col("quantile_value"))).as("lo"),
          max(when(col("q") === 0.95, col("quantile_value"))).as("hi"))
      pts.join(broadcast(bounds), "series")
        .select(col("series"), col("lo"), col("hi"),
          greatest(col("lo"), least(col("hi"), col("v"))).as("cv"),
          when(col("v") < col("lo"), 1L).otherwise(0L).as("il"),
          when(col("v") > col("hi"), 1L).otherwise(0L).as("ih"))
        .groupBy("series", "lo", "hi")
        .agg(count(lit(1)).as("n"),
          sum("il").as("n_clamped_low"),
          sum("ih").as("n_clamped_high"),
          (sum(col("cv").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("mean_winsorized"))
        .select(col("series"), col("lo"), col("hi"), col("n"),
          col("n_clamped_low"), col("n_clamped_high"),
          col("mean_winsorized"))
        .orderBy("series")
    },

    // EXTENSION: semi-structured extraction — the events `props` column is
    // a JSON string (the shape every web-scale event/metadata pipeline
    // carries). Typed `from_json` with an explicit schema (no sampling
    // pass, no schema inference job) projects the field inside whole-stage
    // codegen, then an ordinary aggregation runs on the EXTRACTED value —
    // the parse happens once per row, map-side, and only the projected
    // field materializes. Integer-only aggregates keep the oracle
    // hash-exact.
    QueryDef.withOracle("events_json_extract",
      """SELECT event_type,
        |  CAST(CAST(props->>'$.k' AS BIGINT) // 10 AS BIGINT) AS k_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val kSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      Tables(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), kSchema).getField("k").as("k"))
        .groupBy(col("event_type"),
          floor(col("k") / 10).cast("long").as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type", "k_bucket")
    },

    // EXTENSION: ordered funnel (view → click → purchase) per user — stage
    // i counts users with a stage-i event at-or-after their EARLIEST reach
    // of stage i−1 (EventOps.funnel; every join/agg keys on the user, one
    // exchange layout end-to-end). The oracle cascades the same min-time
    // reach CTEs.
    QueryDef.withOracle("events_funnel",
      """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
        |           FROM events),
        |r0 AS (SELECT u, min(t) AS rt FROM e WHERE et = 'view' GROUP BY 1),
        |r1 AS (SELECT e.u, min(e.t) AS rt FROM e JOIN r0 ON e.u = r0.u
        |       WHERE e.et = 'click' AND e.t >= r0.rt GROUP BY 1),
        |r2 AS (SELECT e.u, min(e.t) AS rt FROM e JOIN r1 ON e.u = r1.u
        |       WHERE e.et = 'purchase' AND e.t >= r1.rt GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage,
        |         count(*) AS n_users FROM r0
        |  UNION ALL SELECT CAST(1 AS INT), 'click', count(*) FROM r1
        |  UNION ALL SELECT CAST(2 AS INT), 'purchase', count(*) FROM r2
        |) ORDER BY stage_idx""".stripMargin) { (s, dir) =>
      EventOps.funnel(
        Tables.eventsTsdb(s, dir).withColumnRenamed("series", "event_type"),
        "user_id", "event_type", "time_us",
        Seq("view", "click", "purchase"))
    },

    // EXTENSION: TIME-TO-CONVERT quantiles — for every user completing the
    // full funnel, latency = final-stage reach − first-stage reach; exact
    // {0, .25, .5, .9, 1} quantiles via the counting-sort machinery (the
    // "median time to convert" product metric). Composes the funnel's
    // per-user reach facts (EventOps.funnelReach) with
    // TimeSeriesOps.quantiles — fact table rows = users, quantile rows =
    // value-space aggregates, both bounded far below the event count.
    QueryDef.withOracle("events_funnel_latency",
      """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
        |           FROM events),
        |r0 AS (SELECT u, min(t) AS rt FROM e WHERE et = 'view' GROUP BY 1),
        |r1 AS (SELECT e.u, min(e.t) AS rt FROM e JOIN r0 ON e.u = r0.u
        |       WHERE e.et = 'click' AND e.t >= r0.rt GROUP BY 1),
        |r2 AS (SELECT e.u, min(e.t) AS rt FROM e JOIN r1 ON e.u = r1.u
        |       WHERE e.et = 'purchase' AND e.t >= r1.rt GROUP BY 1),
        |lat AS (SELECT 'all' AS series, CAST(r2.rt - r0.rt AS DOUBLE) AS v
        |        FROM r2 JOIN r0 ON r2.u = r0.u),
        |cnt AS (SELECT series, v, count(*) AS c FROM lat GROUP BY 1, 2),
        |cum AS (SELECT series, v, c,
        |          sum(c) OVER (PARTITION BY series ORDER BY v
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM cnt),
        |tot AS (SELECT series, sum(c) AS n FROM cnt GROUP BY 1),
        |qs AS (SELECT unnest([0.0, 0.25, 0.5, 0.9, 1.0]) AS q)
        |SELECT c.series, qs.q, c.v AS quantile_value
        |FROM cum c JOIN tot USING (series) CROSS JOIN qs
        |WHERE c.cum >= CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
        |  AND c.cum - c.c < CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
        |ORDER BY series, q""".stripMargin) { (s, dir) =>
      val reach = EventOps.funnelReach(
        Tables.eventsTsdb(s, dir).withColumnRenamed("series", "event_type"),
        "user_id", "event_type", "time_us",
        Seq("view", "click", "purchase"))
      val first = reach.filter(col("stage_idx") === 0)
        .select(col("u"), col("rt").as("rt0"))
      val last = reach.filter(col("stage_idx") === 2)
        .select(col("u"), col("rt").as("rt2"))
      val lat = last.join(first, "u")
        .select(lit("all").as("series"),
          (col("rt2") - col("rt0")).cast("double").as("v"))
      TimeSeriesOps.quantiles(lat, "series", "v", Seq(0.0, 0.25, 0.5, 0.9, 1.0))
    },

    // EXTENSION: weekly cohort retention — cohort = the week bucket of a
    // user's first event; each row counts how many of that cohort's users
    // were active `offset` weeks later (EventOps.cohortRetention; the
    // activity set dedups to (user, week) before the cohort join, and the
    // bucket arithmetic is integral `div`, never a lossy double divide).
    // EXTENSION: robust MAD-based anomaly detection — median and MAD are
    // exact "lower" picks from the counting-sort quantile machinery (value
    // space, not point space), |v−med| and k·MAD are single IEEE ops, so
    // the flagged set is bit-identical across engines. A z-score flavor
    // would need order-dependent double sums; one fat-fingered reading also
    // drags its threshold, while a median shrugs.
    QueryDef.withOracle("tsdb_anomaly",
      s"""WITH pts AS (
         |  SELECT series, time_us, value AS v FROM $EV
         |  WHERE value IS NOT NULL AND time_us BETWEEN $T0 AND $T1),
         |cnt AS (SELECT series, v, count(*) AS c FROM pts GROUP BY 1, 2),
         |cum AS (SELECT series, v, c,
         |          sum(c) OVER (PARTITION BY series ORDER BY v
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM cnt),
         |tot AS (SELECT series, sum(c) AS n FROM cnt GROUP BY 1),
         |med AS (SELECT c.series, c.v AS med
         |        FROM cum c JOIN tot USING (series)
         |        WHERE c.cum >= CAST(floor((tot.n - 1) * 0.5) AS BIGINT) + 1
         |          AND c.cum - c.c < CAST(floor((tot.n - 1) * 0.5) AS BIGINT) + 1),
         |dv AS (SELECT p.series, p.time_us, p.v, m.med, abs(p.v - m.med) AS dev
         |       FROM pts p JOIN med m USING (series)),
         |dcnt AS (SELECT series, dev, count(*) AS c FROM dv GROUP BY 1, 2),
         |dcum AS (SELECT series, dev, c,
         |           sum(c) OVER (PARTITION BY series ORDER BY dev
         |                        ROWS UNBOUNDED PRECEDING) AS cum
         |         FROM dcnt),
         |dtot AS (SELECT series, sum(c) AS n FROM dcnt GROUP BY 1),
         |mad AS (SELECT c.series, c.dev AS mad
         |        FROM dcum c JOIN dtot USING (series)
         |        WHERE c.cum >= CAST(floor((dtot.n - 1) * 0.5) AS BIGINT) + 1
         |          AND c.cum - c.c < CAST(floor((dtot.n - 1) * 0.5) AS BIGINT) + 1)
         |SELECT d.series, d.time_us, d.v, d.med, d.dev, m.mad
         |FROM dv d JOIN mad m USING (series)
         |WHERE d.dev > 3.0 * m.mad
         |ORDER BY series, time_us""".stripMargin) { (s, dir) =>
      TimeSeriesOps.madOutliers(
        Tables.eventsTsdb(s, dir).filter(col("time_us").between(T0, T1)),
        "series", "time_us", "value", k = 3.0)
    },

    // EXTENSION: equi-depth histogram — k bins at the exact i/k quantile
    // boundaries (the value-space splits a skew-aware partitioner needs;
    // fixed-width bins collapse under heavy tails). Bin assignment = count
    // of boundaries strictly below v: integers from exact double compares,
    // so the histogram replays bitwise.
    QueryDef.withOracle("tsdb_histogram_eqdepth",
      s"""WITH pts AS (
         |  SELECT series, value AS v FROM $EV
         |  WHERE value IS NOT NULL AND time_us BETWEEN $T0 AND $T1),
         |cnt AS (SELECT series, v, count(*) AS c FROM pts GROUP BY 1, 2),
         |cum AS (SELECT series, v, c,
         |          sum(c) OVER (PARTITION BY series ORDER BY v
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM cnt),
         |tot AS (SELECT series, sum(c) AS n FROM cnt GROUP BY 1),
         |qs AS (SELECT unnest([0.25, 0.5, 0.75]) AS q),
         |bnd AS (SELECT c.series, list(c.v ORDER BY c.v) AS bounds
         |        FROM cum c JOIN tot USING (series) CROSS JOIN qs
         |        WHERE c.cum >= CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
         |          AND c.cum - c.c < CAST(floor((tot.n - 1) * qs.q) AS BIGINT) + 1
         |        GROUP BY 1),
         |binned AS (SELECT p.series, p.v,
         |             len(list_filter(b.bounds, x -> p.v > x)) AS bin
         |           FROM pts p JOIN bnd b USING (series))
         |SELECT series, CAST(bin AS INT) AS bin, count(*) AS n,
         |       min(v) AS min_value, max(v) AS max_value
         |FROM binned GROUP BY 1, 2 ORDER BY series, bin""".stripMargin) { (s, dir) =>
      TimeSeriesOps.histogramEqDepth(
        Tables.eventsTsdb(s, dir).filter(col("time_us").between(T0, T1)),
        "series", "value", k = 4)
    },

    // EXTENSION: LTTB-style visual downsampling in its bucket-parallel
    // (centroid-anchored) form — one representative point per (series,
    // day), chosen by largest triangle area against the neighbor buckets'
    // centroids; endpoint buckets keep their first/last point. Centroid
    // arithmetic is exact decimal sums divided once in double; the area is
    // a fixed-shape cross product — bitwise identical in any engine.
    QueryDef.withOracle("tsdb_downsample_lttb",
      s"""WITH pts AS (
         |  SELECT series, time_us AS t, value AS v FROM $EV
         |  WHERE value IS NOT NULL AND time_us BETWEEN $T0 AND $T1),
         |b AS (SELECT series, t // $DAY AS bucket, t, v FROM pts),
         |cent AS (SELECT series, bucket,
         |           CAST(SUM(CAST(t AS HUGEINT)) AS DOUBLE) / count(*) AS c_t,
         |           CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS c_v
         |         FROM b GROUP BY 1, 2),
         |nb AS (SELECT series, bucket,
         |         lag(c_t) OVER w AS a_t, lag(c_v) OVER w AS a_v,
         |         lead(c_t) OVER w AS n_t, lead(c_v) OVER w AS n_v
         |       FROM cent WINDOW w AS (PARTITION BY series ORDER BY bucket)),
         |j AS (SELECT b.series, b.bucket, b.t, b.v, a_t, a_v, n_t, n_v
         |      FROM b JOIN nb USING (series, bucket)),
         |r AS (SELECT series, bucket, t, v,
         |        row_number() OVER (PARTITION BY series, bucket ORDER BY
         |          CASE WHEN a_t IS NULL THEN t
         |               WHEN n_t IS NULL THEN -t ELSE 0 END ASC,
         |          abs((a_t - n_t) * (v - a_v) - (a_t - t) * (n_v - a_v))
         |            DESC NULLS LAST,
         |          t ASC) AS rn
         |      FROM j)
         |SELECT series, bucket, t AS time_us, v FROM r WHERE rn = 1
         |ORDER BY series, bucket""".stripMargin) { (s, dir) =>
      TimeSeriesOps.lttbDownsample(
        Tables.eventsTsdb(s, dir).filter(col("time_us").between(T0, T1)),
        "series", "time_us", "value", bucketUs = DAY)
    },

    // EXTENSION: sliding-window distinct-user engagement (the WAU-per-day
    // surface). EXACT distinct — the event log collapses to DISTINCT
    // (user, day) in its single pass, each active-day row fans out to the
    // ≤7 window-ends it serves, and both downstream aggregations run on
    // bounded keys; no per-window re-scan, no HyperLogLog approximation.
    QueryDef.withOracle("events_active_users",
      s"""WITH active AS (
         |  SELECT DISTINCT user_id AS u, epoch_us(ts) // $DAY AS b
         |  FROM events),
         |mx AS (SELECT max(b) AS mb FROM active),
         |wins AS (SELECT DISTINCT u, b + oo AS window_end
         |         FROM active CROSS JOIN (SELECT unnest(range(0, 7)) AS oo))
         |SELECT window_end, count(*) AS n_users FROM wins
         |WHERE window_end <= (SELECT mb FROM mx)
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      EventOps.activeUsersSliding(
        Tables.eventsTsdb(s, dir), "user_id", "time_us",
        bucketUs = DAY, windowBuckets = 7)
    },

    // EXTENSION: multi-dimensional CUBE rollup — (type × day), (type),
    // (day) and grand total from ONE scan via Catalyst's native cube
    // (partial agg before the shuffle; the naive form is four union'd
    // jobs). DECIMAL sums are order-independent, GROUPING() indicators
    // distinguish rolled-up NULLs from data NULLs.
    QueryDef.withOracle("events_rollup_cube",
      s"""SELECT event_type AS series, epoch_us(ts) // $DAY AS b,
         |  count(value) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  min(value) AS min_value, max(value) AS max_value,
         |  CAST(GROUPING(event_type) AS INT) AS g_type,
         |  CAST(GROUPING(b) AS INT) AS g_bucket
         |FROM events GROUP BY CUBE (series, b)
         |ORDER BY g_type, g_bucket, series, b""".stripMargin) { (s, dir) =>
      EventOps.rollupCube(
        Tables.eventsTsdb(s, dir), "series", "time_us", "value", bucketUs = DAY)
    },

    // EXTENSION: conversion-window funnel — stage i counts only within 2
    // days of the prior reach (the product-analytics form; the unbounded
    // face is events_funnel). Same one-exchange user-keyed shape.
    QueryDef.withOracle("events_funnel_windowed", {
      val W = 2 * DAY
      s"""WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
         |           FROM events),
         |r0 AS (SELECT u, min(t) AS rt FROM e WHERE et = 'view' GROUP BY 1),
         |r1 AS (SELECT e.u, min(e.t) AS rt FROM e JOIN r0 ON e.u = r0.u
         |       WHERE e.et = 'click' AND e.t >= r0.rt AND e.t <= r0.rt + $W
         |       GROUP BY 1),
         |r2 AS (SELECT e.u, min(e.t) AS rt FROM e JOIN r1 ON e.u = r1.u
         |       WHERE e.et = 'purchase' AND e.t >= r1.rt AND e.t <= r1.rt + $W
         |       GROUP BY 1)
         |SELECT * FROM (
         |  SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage,
         |         count(*) AS n_users FROM r0
         |  UNION ALL SELECT CAST(1 AS INT), 'click', count(*) FROM r1
         |  UNION ALL SELECT CAST(2 AS INT), 'purchase', count(*) FROM r2
         |) ORDER BY stage_idx""".stripMargin
    }) { (s, dir) =>
      EventOps.funnel(
        Tables.eventsTsdb(s, dir).withColumnRenamed("series", "event_type"),
        "user_id", "event_type", "time_us",
        Seq("view", "click", "purchase"), windowUs = Some(2 * DAY))
    },

    // EXTENSION: KMV distinct-count sketch — the BOUNDED-STATE path beside
    // exact distinct (at 100 TB the exact form shuffles every distinct
    // key; the sketch shuffles at most k=64 hashes per group via a custom
    // typed Aggregator with map-side partial merges). The k smallest
    // distinct hashes are the same set no matter how partials merge, so
    // unlike HLL the estimate is DETERMINISTIC and the oracle replays it.
    // SKETCH-ONLY in the hot path: the exact distinct lives only here in
    // the oracle (as calibration) and in EventOpsSpec, which plan-asserts
    // the registered query contains no exact-distinct aggregation.
    QueryDef.withOracle("events_distinct_kmv", {
      val h = OracleText.wordHashSql("CAST(user_id AS VARCHAR)")
      s"""WITH src AS (SELECT event_type AS series, user_id FROM events),
         |h AS (SELECT DISTINCT series,
         |        ($h * ${graft.ops.SketchOps.MixA} + ${graft.ops.SketchOps.MixC})
         |          % ${graft.ops.TextOps.P} AS hv FROM src),
         |r AS (SELECT series, hv, row_number() OVER (
         |        PARTITION BY series ORDER BY hv) AS rn FROM h),
         |kth AS (SELECT series, max(hv) AS kth, count(*) AS have
         |        FROM r WHERE rn <= 64 GROUP BY 1)
         |SELECT k.series, k.kth AS kth_hash,
         |  CASE WHEN k.have < 64 THEN CAST(k.have AS DOUBLE)
         |       ELSE 63.0 * CAST(${graft.ops.TextOps.P} AS DOUBLE)
         |              / CAST(k.kth AS DOUBLE) END AS n_kmv
         |FROM kth k ORDER BY series""".stripMargin
    }) { (s, dir) =>
      graft.ops.SketchOps.distinctKmv(
        Tables.eventsTsdb(s, dir), "series", "user_id", k = 64)
    },

    // EXTENSION: top user-journey prefixes — each user's first 5 event
    // types in (time, id) order as a path string, counted across users.
    // The first-k filter runs BEFORE any collect, so aggregation rows are
    // bounded by k, not by a power user's history.
    QueryDef.withOracle("events_top_paths",
      s"""WITH e AS (SELECT user_id AS u, event_type AS et,
         |             epoch_us(ts) AS t, event_id FROM events),
         |rn AS (SELECT u, et, row_number() OVER (
         |         PARTITION BY u ORDER BY t, event_id) AS rn FROM e),
         |p AS (SELECT u, string_agg(et, '>' ORDER BY rn) AS path
         |      FROM rn WHERE rn <= 5 GROUP BY u)
         |SELECT path, count(*) AS n_users FROM p GROUP BY 1
         |ORDER BY n_users DESC, path LIMIT 25""".stripMargin) { (s, dir) =>
      EventOps.topPaths(
        Tables.eventsTsdb(s, dir), "user_id", "series", "time_us", "event_id",
        k = 5, topN = 25)
    },

    QueryDef.withOracle("events_cohort_retention",
      s"""WITH e AS (SELECT DISTINCT user_id AS u,
         |             epoch_us(ts) // ${7 * DAY} AS b FROM events),
         |f AS (SELECT u, min(b) AS cohort FROM e GROUP BY 1)
         |SELECT f.cohort, e.b - f.cohort AS offset, count(*) AS n_active
         |FROM e JOIN f ON e.u = f.u
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      EventOps.cohortRetention(
        Tables.eventsTsdb(s, dir), "user_id", "time_us", bucketUs = 7 * DAY)
    }
    // delete-from-front semantics are exercised for real by
    // graft.queries.EngineQueries (engine_delete_front): write -> delete ->
    // re-write -> read through the engine; the round-1 self-confirming
    // `tsdb_delete_front_view` entry is retired.
  )
}
