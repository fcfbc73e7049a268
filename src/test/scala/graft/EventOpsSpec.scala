package graft

import graft.ops.EventOps

/** Hand-checked fixtures for the event-analytics extensions (funnel,
  * cohort retention): ordering semantics are the whole operator, so every
  * user's path is chosen to pin one rule. */
class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("funnel: stage reach requires an event at-or-after the prior reach") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: purchase BEFORE the first view -> stops at click
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 15L),
      // u3: click before view -> stops at view (click never recurs)
      (3L, "click", 8L), (3L, "view", 9L),
      // u4: never views -> in no stage, even with click+purchase
      (4L, "click", 1L), (4L, "purchase", 2L),
      // u5: same-timestamp chain counts (at-or-after is inclusive)
      (5L, "view", 7L), (5L, "click", 7L), (5L, "purchase", 7L)
    ).toDF("user_id", "event_type", "time_us")
    val got = EventOps.funnel(ev, "user_id", "event_type", "time_us",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((0, "view", 4L), (1, "click", 3L), (2, "purchase", 2L)))
  }

  test("funnel: reach time is the EARLIEST qualifying event, not any") {
    // u1 clicks twice after viewing; the purchase lies between the clicks —
    // it qualifies because reach(click) is the FIRST click
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 25L),
      (1L, "click", 30L)
    ).toDF("user_id", "event_type", "time_us")
    val got = EventOps.funnel(ev, "user_id", "event_type", "time_us",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(1L, 1L, 1L))
  }

  test("cohortRetention: integral buckets, per-bucket dedup, offset counts") {
    val w = 100L // bucket width
    val ev = Seq(
      (1L, 10L), (1L, 20L),  // u1 cohort 0, active twice in bucket 0 -> once
      (1L, 250L),            // u1 active at offset 2
      (2L, 110L), (2L, 210L), // u2 cohort 1, offsets 0 and 1
      (3L, 120L)             // u3 cohort 1, offset 0
    ).toDF("user_id", "time_us")
    val got = EventOps.cohortRetention(ev, "user_id", "time_us", w)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("activeUsersSliding: dedup-first, window membership, trailing clamp") {
    val w = 10L // bucket width; window = 3 buckets ending at each bucket
    val ev = Seq(
      (1L, 5L), (1L, 7L),   // u1 bucket 0 twice -> ONE active-day row
      (1L, 25L),            // u1 bucket 2
      (2L, 15L),            // u2 bucket 1
      (3L, 45L)             // u3 bucket 4 (buckets 3..4 exist, 3 is empty)
    ).toDF("user_id", "time_us")
    val got = EventOps.activeUsersSliding(ev, "user_id", "time_us", w, 3)
      .as[(Long, Long)].collect().toSeq
    // window_end e counts distinct users active in buckets e-2..e;
    // ends 5,6 (beyond the last observed bucket 4) are clamped away
    assert(got == Seq(
      (0L, 1L),            // u1
      (1L, 2L),            // u1(b0), u2(b1)
      (2L, 2L),            // u1(b0 and b2 -> once), u2
      (3L, 2L),            // u1(b2), u2(b1)
      (4L, 2L)))           // u1(b2), u3(b4)
  }

  test("funnel with conversion window: late conversions fall out of the stage") {
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 15L),   // converts inside the window
      (2L, "view", 10L), (2L, "click", 100L),  // too late for W=20
      // u3: first click late, SECOND click inside the window still counts
      (3L, "view", 10L), (3L, "click", 50L), (3L, "click", 25L)
    ).toDF("user_id", "event_type", "time_us")
    val got = EventOps.funnel(ev, "user_id", "event_type", "time_us",
        Seq("view", "click"), windowUs = Some(20L))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((0, "view", 3L), (1, "click", 2L)))
    // unbounded face unchanged: all three convert
    assert(EventOps.funnel(ev, "user_id", "event_type", "time_us",
        Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSeq
      == Seq((0, "view", 3L), (1, "click", 3L)))
  }

  test("KmvAggregator: distinct semantics, k-bound, order-free merge; exact small groups") {
    import graft.ops.SketchOps
    import spark.implicits.newLongArrayEncoder
    val agg = new SketchOps.KmvAggregator(4)
    val a = Seq(50L, 10L, 30L, 10L).foldLeft(agg.zero)(agg.reduce) // dedup
    assert(a.toSeq == Seq(10L, 30L, 50L))
    val b = Seq(20L, 40L, 5L, 60L, 70L).foldLeft(agg.zero)(agg.reduce) // trims at k
    assert(b.toSeq == Seq(5L, 20L, 40L, 60L))
    assert(agg.merge(a, b).toSeq == Seq(5L, 10L, 20L, 30L))
    assert(agg.merge(b, a).toSeq == agg.merge(a, b).toSeq) // merge order free
    // end to end: a small group is EXACT (sketch saw every value) —
    // output is sketch-only (s, kth_hash, n_kmv)
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L)).toDF("s", "uid")
    val row = SketchOps.distinctKmv(df, "s", "uid", k = 4).collect().head
    assert(row.length == 3 && row.getDouble(2) == 3.0)
  }

  test("distinctKmv hot path: estimate calibrated vs exact, NO exact-distinct in the plan") {
    import graft.ops.SketchOps
    // 3 groups × up to 500 distinct uids (well past k=64 → estimator regime)
    val rows = for (g <- 0 until 3; u <- 0 until (g + 1) * 150)
      yield (s"g$g", (g * 10000 + u).toLong)
    val df = rows.toDF("s", "uid")
    val est = SketchOps.distinctKmv(df, "s", "uid", k = 64)
    // the registered query must carry no exact count(distinct) — the
    // sketch exists to avoid it; plan-asserted structurally
    val plan = est.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("distinct"), plan)
    val got = est.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (g <- 0 until 3) {
      val exact = (g + 1) * 150.0
      val rel = math.abs(got(s"g$g") - exact) / exact
      // KMV with k=64: relative SD ≈ 1/√(k−2) ≈ 0.13; allow 3σ
      assert(rel < 0.4, s"g$g estimate ${got(s"g$g")} vs exact $exact")
    }
  }

  test("topPaths: first-k prefix in (time, id) order, counts, deterministic top") {
    val ev = Seq(
      // u1 and u2 share the path view>click (u2's purchase is 4th > k=3... )
      (1L, "view", 10L, 100L), (1L, "click", 20L, 101L),
      (2L, "view", 5L, 200L), (2L, "click", 6L, 201L),
      // u3: same-time tie broken by event_id -> click before view
      (3L, "click", 7L, 300L), (3L, "view", 7L, 301L),
      // u4: k=3 truncates the 4th event
      (4L, "view", 1L, 400L), (4L, "click", 2L, 401L),
      (4L, "purchase", 3L, 402L), (4L, "view", 4L, 403L)
    ).toDF("user_id", "event_type", "time_us", "event_id")
    val got = EventOps.topPaths(ev, "user_id", "event_type", "time_us",
        "event_id", k = 3, topN = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("view>click", 2L),                   // u1, u2
      ("click>view", 1L),                   // u3 (tie broken by id)
      ("view>click>purchase", 1L)))         // u4 truncated at k=3
  }

  test("rollupCube: four grouping sets from one pass, GROUPING() flags") {
    val ev = Seq(
      ("a", 5L, Some(1.0)), ("a", 15L, Some(2.0)),
      ("b", 5L, Some(4.0)), ("b", 7L, None)
    ).toDF("event_type", "time_us", "value")
    val got = EventOps.rollupCube(ev, "event_type", "time_us", "value", 10L)
      .select("series", "b", "n", "sum_value", "g_type", "g_bucket")
      .as[(Option[String], Option[Long], Long, Option[Double], Int, Int)]
      .collect().toSet
    assert(got == Set(
      (Some("a"), Some(0L), 1L, Some(1.0), 0, 0),
      (Some("a"), Some(1L), 1L, Some(2.0), 0, 0),
      (Some("b"), Some(0L), 1L, Some(4.0), 0, 0), // data NULL value: n=1 of 2 rows
      (Some("a"), None, 2L, Some(3.0), 0, 1),
      (Some("b"), None, 1L, Some(4.0), 0, 1),
      (None, Some(0L), 2L, Some(5.0), 1, 0),
      (None, Some(1L), 1L, Some(2.0), 1, 0),
      (None, None, 3L, Some(7.0), 1, 1)))
  }
}
