package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over a (user, type, time) log — the funnel /
  * cohort operators an events pipeline runs beside the per-series TSDB
  * surface. Both are single-key shuffle shapes: every aggregation and join
  * keys on the user, so Catalyst reuses one exchange layout end-to-end and
  * parallelism scales with the user population, never with time. */
object EventOps {

  /** Ordered-funnel user counts: a user reaches stage i iff an event of
    * `stages(i)` occurs at-or-after the user's reach time of stage i−1,
    * and the reach time is the EARLIEST such event (strict ordering — a
    * purchase before the first view does not convert). Emits one row per
    * stage with the surviving-user count.
    *
    * Shape: k = stages.length per-stage min-aggregations and joins, all
    * keyed on the user — k is small and fixed (a funnel definition), the
    * data passes are map-side filters on the event type plus same-key
    * joins, so no stage is ever quadratic and AQE may broadcast the
    * shrinking reach side as the funnel narrows. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             timeCol: String, stages: Seq[String],
             windowUs: Option[Long] = None): DataFrame =
    funnelReach(events, userCol, typeCol, timeCol, stages, windowUs)
      .groupBy("stage_idx", "stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage_idx")

  /** The funnel's per-user fact table: one row per (user, reached stage)
    * with the EARLIEST reach time — what the stage counts aggregate, and
    * what latency analysis ("median time to convert") consumes directly. */
  def funnelReach(events: DataFrame, userCol: String, typeCol: String,
                  timeCol: String, stages: Seq[String],
                  windowUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowUs.forall(_ > 0), "conversion window must be positive")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(timeCol).as("t"))
    var reach = ev.filter(col("et") === stages.head)
      .groupBy("u").agg(min("t").as("rt"))
    var out = reach.select(lit(0).as("stage_idx"),
      lit(stages.head).as("stage"), col("u"), col("rt"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      // windowUs: stage i counts only within the CONVERSION WINDOW of the
      // prior reach (the product-analytics form: a purchase a month after
      // the click is not that click's conversion)
      val inWindow = windowUs
        .map(w => col("t") <= col("rt") + lit(w)).getOrElse(lit(true))
      reach = ev.filter(col("et") === st)
        .join(reach, "u")
        .filter(col("t") >= col("rt") && inWindow)
        .groupBy("u").agg(min("t").as("rt"))
      out = out.union(reach.select(lit(i).as("stage_idx"),
        lit(st).as("stage"), col("u"), col("rt")))
    }
    out
  }

  /** Sliding-window distinct-user counts (the DAU/WAU engagement surface):
    * for every bucket `e` up to the last observed bucket, the number of
    * DISTINCT users active in buckets (e − windowBuckets, e]. EXACT — no
    * HyperLogLog, so re-runs and engine ports agree bitwise.
    *
    * Scale shape: the event log first collapses to DISTINCT (user, bucket)
    * — the only pass over raw data, a map-side-combinable aggregation — so
    * a user firing 10⁶ events in a day costs ONE row downstream. Each
    * active-day row then fans out to the `windowBuckets` window-ends it
    * serves (bounded small-k explode, no shuffle), is deduplicated to
    * (window, user) and counted — both aggregations on bounded keys. The
    * naive per-window `count(DISTINCT ...)` over raw events re-reads the
    * log once per window; this reads it once, total. */
  def activeUsersSliding(events: DataFrame, userCol: String, timeCol: String,
                         bucketUs: Long, windowBuckets: Int): DataFrame = {
    require(bucketUs > 0 && windowBuckets > 0, "bucket/window must be positive")
    val active = events
      .select(col(userCol).as("u"),
        expr(s"CAST($timeCol AS BIGINT) div $bucketUs").as("b"))
      .distinct()
    // windows are labeled by their END bucket; trailing phantom windows
    // (ends past the last observed bucket) are clamped away
    val maxB = active.agg(max("b").as("max_b"))
    active
      .select(col("u"),
        explode(sequence(col("b"), col("b") + lit(windowBuckets - 1))).as("window_end"))
      .distinct()
      .crossJoin(broadcast(maxB))
      .filter(col("window_end") <= col("max_b"))
      .groupBy("window_end").agg(count(lit(1)).as("n_users"))
      .orderBy("window_end")
  }

  /** Multi-dimensional rollup over the event log — one pass producing the
    * (type × bucket), (type), (bucket) and grand-total aggregates a
    * dashboard reads, via Catalyst's native CUBE (partial aggregation
    * before the shuffle; the four grouping sets share ONE scan instead of
    * four union'd jobs). Sums ride DECIMAL(18,2) so they are
    * order-independent and engine-portable; `g_type`/`g_bucket` are the
    * SQL-standard GROUPING() indicators distinguishing a rolled-up NULL
    * from a data NULL. */
  def rollupCube(events: DataFrame, typeCol: String, timeCol: String,
                 valCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    events
      .select(col(typeCol).as("series"),
        expr(s"CAST($timeCol AS BIGINT) div $bucketUs").as("b"),
        col(valCol).as("v"))
      .cube(col("series"), col("b"))
      .agg(count(col("v")).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min("v").as("min_value"), max("v").as("max_value"),
        // GROUPING() is only legal inside the grouping aggregation itself
        grouping(col("series")).cast("int").as("g_type"),
        grouping(col("b")).cast("int").as("g_bucket"))
      .orderBy(col("g_type"), col("g_bucket"), col("series"), col("b"))
  }

  /** Top user-journey PREFIXES: each user's first `k` event types in
    * (time, id) order concatenated into a path string, counted across
    * users, top `topN` paths — the path-analysis surface (where do users
    * go first?) next to [[funnel]]'s fixed-stage view.
    *
    * Scale shape: the first-k filter is a row_number window on the user —
    * partitions are per-user and spill through the sorter, never a
    * driver-side group — and only THEN does a collect_list run, so the
    * collected array is bounded by `k` (collecting a power user's full
    * history would be an unbounded aggregation row). Path counting is an
    * ordinary bounded-key aggregation; top-N is TakeOrdered, not a full
    * sort. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               timeCol: String, tiebreakCol: String, k: Int, topN: Int): DataFrame = {
    require(k > 0 && topN > 0, "k/topN must be positive")
    events
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        col(timeCol), col(tiebreakCol))
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col(timeCol), col(tiebreakCol))))
      .filter(col("rn") <= k)
      .groupBy("u")
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("rn"), col("et")))),
          s => s.getField("et"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }

  /** Cohort retention: cohort = the time bucket of a user's FIRST event;
    * for every (cohort, bucket-offset) pair, how many of that cohort's
    * users were active that many buckets later. The activity set is
    * deduplicated to (user, bucket) BEFORE the cohort join, so heavy users
    * cost one row per active bucket, not one per event. Bucket arithmetic
    * is integral (`div`) — a double division would lose µs precision on
    * epoch-scale timestamps. */
  def cohortRetention(events: DataFrame, userCol: String, timeCol: String,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val active = events
      .select(col(userCol).as("u"),
        expr(s"CAST($timeCol AS BIGINT) div $bucketUs").as("b"))
      .distinct()
    val cohorts = active.groupBy("u").agg(min("b").as("cohort"))
    active.join(cohorts, "u")
      .groupBy(col("cohort"), (col("b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "offset")
  }
}
