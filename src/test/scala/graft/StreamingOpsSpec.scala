package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{DiffRow, Point}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming query operators: watermarked windowed aggregation (windows
  * finalize once the watermark passes; bounded-late points still count) and
  * stateful per-series difference across micro-batches. */
class StreamingOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("windowedSums finalizes windows at the watermark; bounded-late data still counts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val points = in.toDF().toDF("series", "time_us", "v")
    val q = StreamingOps.windowedSums(points, windowUs = 10000000L, watermarkUs = 5000000L)
      .writeStream.format("memory").queryName("wsums").outputMode(OutputMode.Append()).start()
    try {
      // window [0,10s): 1.0 at t=2s, then a LATE point inside the watermark
      in.addData(("s", 2000000L, 1.0), ("s", 12000000L, 5.0))
      q.processAllAvailable()
      in.addData(("s", 8000000L, 2.0)) // 4s late but within the 5s watermark
      q.processAllAvailable()
      // push event time far enough that the watermark closes both windows
      in.addData(("s", 40000000L, 9.0))
      q.processAllAvailable()
      in.addData(("s", 60000000L, 0.5)) // advances watermark past [30,40)
      q.processAllAvailable()
      val rows = spark.table("wsums")
        .select("window_start", "sum_value", "n").as[(Long, Double, Long)]
        .collect().sortBy(_._1).toSeq
      assert(rows.contains((0L, 3.0, 2L)))         // 1.0 + late 2.0
      assert(rows.contains((10000000L, 5.0, 1L)))
    } finally q.stop()
  }

  test("StreamingRollup: continuous aggregation fills an engine rollup measurement exactly-once") {
    import graft.engine._
    import graft.streaming.StreamingRollup
    implicit val sqlCtx = spark.sqlContext
    val t = new Tsdb(spark, tmpDir("roll-tsdb-"), requestedBucketWidth = 100000000L)
    t.createDatabase("db")
    val in = MemoryStream[(String, Long, Double)]
    val points = in.toDF().toDF("series", "time_us", "v")
    val ckpt = tmpDir("roll-ckpt-")
    val q = StreamingRollup.start(t, "db", "m", points,
      windowUs = 10000000L, watermarkUs = 5000000L, checkpoint = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(("a", 2000000L, 1.0), ("a", 12000000L, 5.0), ("b", 3000000L, 7.0))
      q.processAllAvailable()
      in.addData(("a", 8000000L, 2.0)) // late but inside the watermark
      q.processAllAvailable()
      in.addData(("a", 40000000L, 9.0), ("b", 40000000L, 1.0)) // finalize
      q.processAllAvailable()
      val rollup = StreamingRollup.rollupMeasurement("m", 10000000L)
      assert(rollup == "m__rollup_v_10000000")
      val gotA = t.select("db", rollup, "a", Nil, 0L, Long.MaxValue - 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(4))).toSeq
      // [0,10s): 1.0 + late 2.0; [10,20s): 5.0 — both finalized and written
      assert(gotA == Seq((0L, 3.0, 2L), (10000000L, 5.0, 1L)))
      val gotB = t.select("db", rollup, "b", Nil, 0L, Long.MaxValue - 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(4))).toSeq
      assert(gotB == Seq((0L, 7.0, 1L)))
      // the rollup is a first-class measurement: windowed reads compose
      val wm = t.seriesRange("db", rollup, "a")
      assert(wm.contains(SeriesRange(0L, 10000000L)))
    } finally q.stop()
  }

  test("windowedSumsSliding: a point lands in window/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val points = in.toDF().toDF("series", "time_us", "v")
    val q = StreamingOps.windowedSumsSliding(points,
        windowUs = 10000000L, slideUs = 5000000L, watermarkUs = 1000000L)
      .writeStream.format("memory").queryName("wslide").outputMode(OutputMode.Append()).start()
    try {
      in.addData(("s", 7000000L, 3.0)) // t=7s -> windows [0,10) and [5,15)
      q.processAllAvailable()
      in.addData(("s", 40000000L, 1.0)) // advance watermark, close both
      q.processAllAvailable()
      val rows = spark.table("wslide")
        .select("window_start", "sum_value", "n").as[(Long, Double, Long)]
        .collect().sortBy(_._1).toSeq
      assert(rows.contains((0L, 3.0, 1L)))
      assert(rows.contains((5000000L, 3.0, 1L)))
    } finally q.stop()
  }

  test("sessionCounts merges bursts within the gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val points = in.toDF().toDF("series", "time_us", "v")
    val q = StreamingOps.sessionCounts(points, gapUs = 3000000L, watermarkUs = 1000000L)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      // burst A: 1s, 3s (within 3s gap) — burst B: 10s (new session)
      in.addData(("s", 1000000L, 1.0), ("s", 3000000L, 2.0), ("s", 10000000L, 4.0))
      q.processAllAvailable()
      in.addData(("s", 30000000L, 0.0)) // close both sessions
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select("session_start", "session_end", "n", "sum_value")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(rows.contains((1000000L, 6000000L, 2L, 3.0)))   // A: ends 3s+gap
      assert(rows.contains((10000000L, 13000000L, 1L, 4.0))) // B
    } finally q.stop()
  }

  test("streamingDedupMinId: min doc_id wins within a batch, replicas drop across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val docs = in.toDF().toDF("doc_id", "time_us", "text")
    val q = StreamingOps.streamingDedupMinId(docs, watermarkUs = 5000000L)
      .writeStream.format("memory").queryName("sdedupmin").outputMode(OutputMode.Append()).start()
    try {
      // SAME-batch replicas (docs 7 and 2 share content): winner must be the
      // min doc_id regardless of row order in the batch — listed 7-first here
      in.addData((7L, 1000000L, "alpha beta"), (2L, 2000000L, "alpha beta"),
        (5L, 1500000L, "gamma"))
      q.processAllAvailable()
      // cross-batch replica of the same content within the watermark: drops
      in.addData((9L, 3000000L, "alpha beta"), (4L, 4000000L, "delta"))
      q.processAllAvailable()
      val ids = spark.table("sdedupmin").select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(2L, 4L, 5L)) // 7 loses to 2 in-batch; 9 drops from state
    } finally q.stop()
  }

  test("streamingRate: reset-aware increase across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Point]
    val q = StreamingOps.streamingRate(in.toDS(), unitsPerSecond = 1.0)
      .writeStream.format("memory").queryName("srate").outputMode(OutputMode.Append()).start()
    try {
      in.addData(Point("c", 10L, 10.0), Point("c", 20L, 30.0))
      q.processAllAvailable()
      in.addData(Point("c", 30L, 4.0), Point("c", 40L, 9.0)) // reset at 30
      q.processAllAvailable()
      val rows = spark.table("srate").as[StreamingOps.RateRow].collect()
        .map(r => (r.time_us, r.rate)).sortBy(_._1).toSeq
      assert(rows == Seq((10L, None), (20L, Some(2.0)),
        (30L, Some(0.4)),   // reset repaired FROM STATE: increase = 4 over 10s
        (40L, Some(0.5))))
    } finally q.stop()
  }

  test("streamingDifference carries last point per series across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Point]
    val q = StreamingOps.streamingDifference(in.toDS())
      .writeStream.format("memory").queryName("sdiff").outputMode(OutputMode.Append()).start()
    try {
      in.addData(Point("a", 100L, 1.0), Point("a", 200L, 3.0), Point("b", 100L, 10.0))
      q.processAllAvailable()
      in.addData(Point("a", 300L, 2.5), Point("b", 150L, 9.0)) // next micro-batch
      q.processAllAvailable()
      val rows = spark.table("sdiff").as[DiffRow].collect()
        .map(r => (r.series, r.time_us, r.difference)).sortBy(x => (x._1, x._2)).toSeq
      assert(rows == Seq(
        ("a", 100L, None), ("a", 200L, Some(2.0)),
        ("a", 300L, Some(-0.5)),                   // boundary repaired from state
        ("b", 100L, None), ("b", 150L, Some(-1.0))))
    } finally q.stop()
  }

  test("streamingDistinct: running KMV estimate, sketch carried across batches") {
    import graft.ops.SketchOps
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.UserPoint]
    val q = StreamingOps.streamingDistinct(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("sdist")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamingOps.UserPoint("s", 1L, 10L),
        StreamingOps.UserPoint("s", 2L, 20L))
      q.processAllAvailable()
      in.addData(StreamingOps.UserPoint("s", 3L, 10L),   // replica: no growth
        StreamingOps.UserPoint("s", 4L, 30L),            // 3rd distinct -> k hit
        StreamingOps.UserPoint("s", 5L, 40L))            // estimator branch
      q.processAllAvailable()
      val rows = spark.table("sdist").as[StreamingOps.DistinctRow]
        .collect().sortBy(_.time_us).map(_.n_kmv).toSeq
      // exact below k (sketch saw everything), including across the batch
      // boundary (t=3 sees the carried sketch, not a reset)
      assert(rows.take(3) == Seq(1.0, 2.0, 2.0))
      // at k=3 the estimate switches to (k-1)*P/kth over the running sketch
      def est(us: Seq[Long]) = {
        val hs = us.map(u => SketchOps.mixScalar(SketchOps.polyHashScalar(u.toString)))
          .distinct.sorted.take(3)
        SketchOps.kmvEstimate(hs.toArray, 3)
      }
      assert(rows(3) == est(Seq(10L, 20L, 30L)))
      assert(rows(4) == est(Seq(10L, 20L, 30L, 40L)))
    } finally q.stop()
  }

  test("streamingIntervalJoin: in-batch matches plus clicks carried in join state") {
    implicit val sqlCtx = spark.sqlContext
    val lin = MemoryStream[(String, Long, Double)]
    val rin = MemoryStream[(String, Long, Double)]
    val q = StreamingOps.streamingIntervalJoin(
        lin.toDF().toDF("series", "time_us", "v"),
        rin.toDF().toDF("series", "time_us", "v"),
        windowUs = 100L, watermarkUs = 1000000L)
      .writeStream.format("memory").queryName("sjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      lin.addData(("c", 100L, 1.0), ("c", 300L, 2.0))
      rin.addData(("p", 150L, 10.0))               // in-batch: joins click@100
      q.processAllAvailable()
      rin.addData(("p", 320L, 20.0),               // next batch: click@300 must
                  ("p", 90L, 30.0),                //   come from JOIN STATE
                  ("p", 250L, 40.0))               // matches nothing (gap)
      q.processAllAvailable()
      val rows = spark.table("sjoin")
        .select("l_time_us", "l_v", "r_time_us", "r_v")
        .as[(Long, Double, Long, Double)].collect().sortBy(x => (x._1, x._3)).toSeq
      // r >= l keeps p@90 out of c@100's window (backward-only would differ)
      assert(rows == Seq((100L, 1.0, 150L, 10.0), (300L, 2.0, 320L, 20.0)))
    } finally q.stop()
  }

  test("streamingFunnel: cross-batch stage conversion, equal-time tie, one fact per stage") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.streamingFunnel(
        in.toDS().toDF().as[StreamingOps.UserEvent],
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode(OutputMode.Append()).start()
    import StreamingOps.UserEvent
    try {
      // batch 1: u1 views@10 and clicks@10 (equal time — the click COUNTS,
      // t >= rt is inclusive and the stage_idx tie-break orders the view
      // first); u2's click@5 precedes any view → dropped; u3 views@20
      in.addData(
        UserEvent(1L, "view", 10L), UserEvent(1L, "click", 10L),
        UserEvent(2L, "click", 5L), UserEvent(2L, "view", 8L),
        UserEvent(3L, "view", 20L), UserEvent(3L, "error", 1L))
      q.processAllAvailable()
      // batch 2: u1 purchases (stage-2 reach rides state from batch 1);
      // u2 clicks@30 — now qualified by the view@8 carried in state;
      // u3 re-views@25 (already reached — must NOT re-emit)
      in.addData(
        UserEvent(1L, "purchase", 40L), UserEvent(2L, "click", 30L),
        UserEvent(3L, "view", 25L))
      q.processAllAvailable()
      val rows = spark.table("sfunnel")
        .select("user_id", "stage_idx", "reach_us").as[(Long, Int, Long)]
        .collect().sortBy(x => (x._1, x._2)).toSeq
      assert(rows == Seq(
        (1L, 0, 10L), (1L, 1, 10L), (1L, 2, 40L),
        (2L, 0, 8L), (2L, 1, 30L),
        (3L, 0, 20L)))
    } finally q.stop()
  }

  test("streamingFunnel conversion window: late-stage event outside the window is rejected") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.streamingFunnel(
        in.toDS().toDF().as[StreamingOps.UserEvent],
        Seq("view", "click"), windowUs = Some(10L))
      .writeStream.format("memory").queryName("sfunnelw")
      .outputMode(OutputMode.Append()).start()
    import StreamingOps.UserEvent
    try {
      // u1's click@150 is outside [100, 110] — never converts, not even by
      // a later in-window event (there is none). u2 clicks@108: converts.
      in.addData(
        UserEvent(1L, "view", 100L), UserEvent(1L, "click", 150L),
        UserEvent(2L, "view", 100L))
      q.processAllAvailable()
      in.addData(UserEvent(2L, "click", 108L)) // in-window, cross-batch state
      q.processAllAvailable()
      val rows = spark.table("sfunnelw")
        .select("user_id", "stage_idx", "reach_us").as[(Long, Int, Long)]
        .collect().sortBy(x => (x._1, x._2)).toSeq
      assert(rows == Seq((1L, 0, 100L), (2L, 0, 100L), (2L, 1, 108L)))
    } finally q.stop()
  }
}
