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

  test("madOutliers matches the naive lower-median model for random multisets") {
    val rng = new Random(29)
    for (trial <- 1 to 5) {
      val rows = (1 to 2 + rng.nextInt(200)).map { i =>
        (s"s${rng.nextInt(3)}", i.toLong, rng.nextInt(80) / 4.0)
      }
      val got = TimeSeriesOps.madOutliers(
          rows.toDF("series", "time_us", "v"), "series", "time_us", "v", k = 3.0)
        .select("series", "time_us").as[(String, Long)].collect().toSet
      // .toSeq before flatMap: a Map.flatMap over pair results rebuilds a
      // MAP and silently collapses all of a series' outliers to one entry
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (s, g) =>
        def lowerMedian(xs: Seq[Double]): Double =
          xs.sorted.apply((xs.size - 1) / 2)
        val med = lowerMedian(g.map(_._3))
        val mad = lowerMedian(g.map(r => math.abs(r._3 - med)))
        g.filter(r => math.abs(r._3 - med) > 3.0 * mad).map(r => (s, r._2))
      }.toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("lttbDownsample matches the naive centroid-anchored model") {
    val rng = new Random(31)
    for (trial <- 1 to 5) {
      val w = Seq(64L, 100L, 250L)(trial % 3)
      val ts = Iterator.continually(rng.nextLong(2000)).distinct.take(150).toSeq.sorted
      // 0.25-grid values: exact in double AND in decimal(18,2), so the
      // naive BigDecimal centroid mirrors the operator's decimal sums
      val pts = ts.map(t => (t, rng.nextInt(64) / 4.0))
      val got = TimeSeriesOps.lttbDownsample(
          pts.map { case (t, v) => ("s", t, v) }.toDF("series", "time_us", "v"),
          "series", "time_us", "v", bucketUs = w)
        .select("bucket", "time_us", "v").as[(Long, Long, Double)]
        .collect().toSeq.sortBy(_._1)
      val byBucket = pts.groupBy(_._1 / w).toSeq.sortBy(_._1)
      // sums are exact in double here (small longs; 0.25-grid values), so
      // plain double sums equal the operator's decimal sums bit-for-bit
      def centroid(g: Seq[(Long, Double)]): (Double, Double) =
        (g.map(_._1).sum.toDouble / g.size, g.map(_._2).sum / g.size)
      val expect = byBucket.zipWithIndex.map { case ((b, g), i) =>
        val sortedG = g.sortBy(_._1)
        val pick =
          if (i == 0) sortedG.head
          else if (i == byBucket.size - 1) sortedG.last
          else {
            val (at, av) = centroid(byBucket(i - 1)._2)
            val (nt, nv) = centroid(byBucket(i + 1)._2)
            sortedG.maxBy { case (t, v) =>
              // max area, ties -> EARLIEST t (maxBy keeps the first max)
              (math.abs((at - nt) * (v - av) - (at - t) * (nv - av)), -t)
            }
          }
        (b, pick._1, pick._2)
      }
      assert(got == expect, s"trial $trial w=$w")
    }
  }
}
