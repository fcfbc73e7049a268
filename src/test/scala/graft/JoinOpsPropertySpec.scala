package graft

import graft.ops.TimeSeriesOps
import scala.util.Random

/** Randomized cross-check of the bucket-parallel cross-stream operators
  * (asofJoin / rangeJoinAgg / sessionize) against naive in-memory models —
  * the bucket/boundary machinery must be invisible in the results for any
  * point distribution, bucket width, and parameter choice. */
class JoinOpsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def distinctTs(rng: Random, n: Int, span: Long): Seq[Long] =
    Iterator.continually(rng.nextLong(span)).distinct.take(n).toSeq.sorted

  test("asofJoin matches the naive backward scan on random inputs") {
    val rng = new Random(7)
    for (trial <- 1 to 5) {
      val w = Seq(50L, 100L, 1000L)(trial % 3)
      val lts = distinctTs(rng, 60, 3000)
      val rts = distinctTs(rng, 40, 3000)
      val rv = rts.map(t => t -> rng.nextDouble()).toMap
      val got = TimeSeriesOps.asofJoin(
          lts.map(t => (t, 0)).toDF("ts", "pad"),
          rts.map(t => (t, rv(t))).toDF("ts", "rv"),
          "ts", "rv", bucketWidth = w)
        .select("ts", "asof_time", "asof_rv")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
      lts.foreach { t =>
        val expect = rts.filter(_ <= t).lastOption.map(rt => (rt, rv(rt)))
        assert(got(t) == expect, s"trial $trial w=$w left=$t")
      }
    }
  }

  test("rangeJoinAgg matches the naive window scan on random inputs") {
    val rng = new Random(11)
    for (trial <- 1 to 5) {
      val w = Seq(100L, 250L, 1000L)(trial % 3)
      val lookback = 1L + rng.nextLong(w)
      val lts = distinctTs(rng, 50, 2500)
      val rts = distinctTs(rng, 50, 2500)
      val rv = rts.map(t => t -> rng.nextDouble()).toMap
      val got = TimeSeriesOps.rangeJoinAgg(
          lts.map(t => (t, 0)).toDF("ts", "pad"),
          rts.map(t => (t, rv(t))).toDF("ts", "rv"),
          "ts", "rv", lookback = lookback, bucketWidth = w)
        .select("ts", "n_in_window", "max_in_window")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
      lts.foreach { t =>
        val in = rts.filter(rt => rt <= t && rt >= t - lookback)
        val expect = (in.size.toLong,
          if (in.isEmpty) None else Some(in.map(rv).max))
        assert(got(t) == expect, s"trial $trial w=$w lookback=$lookback left=$t")
      }
    }
  }

  test("sessionize matches the naive gap split on random inputs") {
    val rng = new Random(13)
    for (trial <- 1 to 5) {
      val w = Seq(64L, 100L, 500L)(trial % 3)
      val gap = 1L + rng.nextLong(w)
      val ts = distinctTs(rng, 80, 4000)
      val got = TimeSeriesOps.sessionize(
          ts.map(t => ("s", t)).toDF("series", "ts"),
          "series", "ts", gapUs = gap, bucketWidth = w)
        .select("session_start", "session_end", "n")
        .as[(Long, Long, Long)].collect().toSeq
      // naive: split the sorted stream at gaps
      val sessions = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= gap) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }.map(s => (s.head, s.last, s.size.toLong))
      assert(got == sessions, s"trial $trial w=$w gap=$gap")
    }
  }
}
