package graft

import graft.ops.TimeSeriesOps
import scala.util.Random

/** Randomized cross-check of the value-space and rate operators against
  * naive in-memory models — the counting-sort and bucket-boundary machinery
  * must be invisible in the results for any value distribution, duplicate
  * density, and bucket width. */
class ValueOpsPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("quantiles match the naive sorted-pick for random multisets") {
    val rng = new Random(17)
    for (trial <- 1 to 5) {
      // duplicate-heavy values: small integer grid scaled to doubles
      val rows = (1 to 2 + rng.nextInt(300)).map { _ =>
        (s"s${rng.nextInt(3)}", rng.nextInt(40) / 4.0)
      }
      val qs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
      val got = TimeSeriesOps.quantiles(rows.toDF("series", "v"), "series", "v", qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      rows.groupBy(_._1).foreach { case (s, g) =>
        val sorted = g.map(_._2).sorted
        qs.foreach { q =>
          val expect = sorted(math.floor((sorted.size - 1) * q).toInt)
          assert(got((s, q)) == expect, s"trial $trial series=$s q=$q n=${sorted.size}")
        }
      }
    }
  }

  test("histogram matches the naive binning for random values incl. negatives") {
    val rng = new Random(19)
    for (trial <- 1 to 5) {
      val width = Seq(0.5, 2.0, 7.5)(trial % 3)
      val rows = (1 to 200).map(_ => ("s", rng.nextInt(200) / 8.0 - 10.0))
      val got = TimeSeriesOps.histogram(rows.toDF("series", "v"), "series", "v", width)
        .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      val expect = rows.map(_._2).groupBy(v => math.floor(v / width).toLong)
        .map { case (b, vs) => b -> ((vs.size.toLong, vs.min, vs.max)) }
      assert(got == expect, s"trial $trial width=$width")
    }
  }

  test("rate matches the naive reset-aware scan for any bucket width") {
    val rng = new Random(23)
    for (trial <- 1 to 5) {
      val w = Seq(50L, 128L, 1000L)(trial % 3)
      val ts = Iterator.continually(rng.nextLong(3000)).distinct.take(100).toSeq.sorted
      val vs = ts.map(t => t -> rng.nextInt(1000) / 10.0).toMap
      val got = TimeSeriesOps.rate(
          ts.map(t => ("s", t, vs(t))).toDF("series", "ts", "v"),
          "series", "ts", "v", unitsPerSecond = 100.0, bucketWidth = w)
        .select("ts", "rate").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      ts.zip(None +: ts.init.map(Some(_))).foreach { case (t, prevT) =>
        val expect = prevT.map { pt =>
          val inc = if (vs(t) >= vs(pt)) vs(t) - vs(pt) else vs(t)
          inc / ((t - pt) / 100.0)
        }
        assert(got(t) == expect, s"trial $trial w=$w ts=$t")
      }
    }
  }
}
