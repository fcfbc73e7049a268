package graft

import graft.engine._
import org.apache.spark.sql.DataFrame
import scala.collection.mutable
import scala.util.Random

/** Mini-soak: a deterministic randomized op sequence (append / delete-front /
  * idempotent re-append / select / count) validated against an in-memory
  * model — the reference's tsdbtest strategy (src/tsdbtest/main.cc:500-607:
  * random queries vs a vector<data_point> model with rotate cycles),
  * shrunk to CI size. */
class EngineSoakSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = MeasurementSchema(Seq(Field("v", FieldType.F64)))

  test("randomized append/delete/select agrees with the in-memory model") {
    val rng = new Random(42) // deterministic
    val t = new Tsdb(spark, tmpDir("soak-"), requestedBucketWidth = 1000L)
    t.createDatabase("db"); t.createMeasurement("db", "m", schema)

    // model: visible points, and the watermarks
    val model = mutable.TreeMap.empty[Long, Double]
    var timeFirst = 1L
    var timeLast = 0L
    var nextTs = 0L

    def mkBatch(n: Int): Seq[(Long, Double)] =
      (1 to n).map { _ =>
        nextTs += 1 + rng.nextInt(500)
        (nextTs, math.round(rng.nextDouble() * 1e4) / 100.0)
      }

    def df(rows: Seq[(Long, Double)]): DataFrame = rows.toDF("time_ns", "v")

    var lastBatch: Seq[(Long, Double)] = Nil
    for (step <- 1 to 50) {
      rng.nextInt(8) match {
        case 0 | 1 => // append new points
          val batch = mkBatch(1 + rng.nextInt(40))
          t.writePoints("db", "m", "s", df(batch))
          batch.foreach { case (ts, v) =>
            if (ts >= timeFirst) { model(ts) = v; timeLast = math.max(timeLast, ts) }
          }
          lastBatch = batch
        case 6 => // bulk-load path: same visibility rules, one-pass write
          val batch = mkBatch(1 + rng.nextInt(40))
          t.bulkLoad("db", "m",
            df(batch).withColumn("series", org.apache.spark.sql.functions.lit("s")))
          batch.foreach { case (ts, v) =>
            if (ts >= timeFirst) { model(ts) = v; timeLast = math.max(timeLast, ts) }
          }
          lastBatch = batch
        case 2 => // idempotent replay of the previous batch + fresh tail
          val fresh = mkBatch(1 + rng.nextInt(10))
          t.writePoints("db", "m", "s", df(lastBatch ++ fresh))
          fresh.foreach { case (ts, v) =>
            if (ts >= timeFirst) { model(ts) = v; timeLast = math.max(timeLast, ts) }
          }
          lastBatch = fresh
        case 3 => // delete from the front at a random existing ts
          if (model.nonEmpty) {
            val keys = model.keys.toSeq
            val cut = keys(rng.nextInt(keys.size))
            t.deleteUpTo("db", "m", "s", cut)
            model.rangeTo(cut).keys.toSeq.foreach(model.remove)
            timeFirst = model.headOption.map(_._1).getOrElse(cut + 1)
          }
        case 5 => // compact: physical-layout-only, the model must not notice
          t.compact("db", "m", "s")
        case 4 => // verify a random range select + count against the model
          if (timeLast > 0) {
            val t0 = rng.nextLong(timeLast + 2)
            val t1 = t0 + rng.nextLong(timeLast + 2)
            val got = t.select("db", "m", "s", Nil, t0, t1).collect()
              .map(r => (r.getLong(0), r.getDouble(1))).toSeq
            val exp = model.range(t0, t1 + 1).toSeq
            assert(got == exp, s"step $step select [$t0,$t1]")
            val c = t.countPoints("db", "m", "s", t0, t1).collect().head
            assert(c.getLong(0) == exp.size, s"step $step count [$t0,$t1]")
          }
        case 7 => // retention sweep (measurement-wide) or value-space check
          if (model.nonEmpty && rng.nextBoolean()) {
            val keys = model.keys.toSeq
            val cut = keys(rng.nextInt(keys.size))
            t.applyRetention("db", "m", cut)
            model.rangeTo(cut).keys.toSeq.foreach(model.remove)
            timeFirst = model.headOption.map(_._1).getOrElse(cut + 1)
          } else if (model.nonEmpty) {
            // exact quantiles vs the model (counting-sort path)
            val vis = t.visible("db", "m")
            val got = graft.ops.TimeSeriesOps
              .quantiles(vis, "series", "v", Seq(0.5, 0.9))
              .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
            val sorted = model.values.toSeq.sorted
            def pick(q: Double) = sorted(math.floor((sorted.size - 1) * q).toInt)
            assert(got(0.5) == pick(0.5) && got(0.9) == pick(0.9),
              s"step $step quantiles")
          }
      }
    }
    // final full sweep
    val all = t.select("db", "m", "s", Nil, 0L, Long.MaxValue - 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(all == model.toSeq)
  }

  test("reflector soak: random outages, replays and flushes never lose or reorder a point") {
    import graft.streaming.{FaultInjectedRemote, Reflector, ReflectorRemote}
    val rng = new Random(1234)
    val localT = new Tsdb(spark, tmpDir("soak-refl-l-"), requestedBucketWidth = 1000L)
    val remoteT = new Tsdb(spark, tmpDir("soak-refl-r-"), requestedBucketWidth = 1000L)
    localT.createDatabase("d"); localT.createMeasurement("d", "m", schema)
    val remote = new FaultInjectedRemote(ReflectorRemote(remoteT))
    val r = new Reflector(localT, remote, Map("d" -> "rd"))
    r.syncSchemas()

    // model: every point ever written, per series (the reflector must never
    // lose or reorder one, whatever the outage pattern)
    val series = Seq("s1", "s2")
    val model = series.map(_ -> mutable.TreeMap.empty[Long, Double]).toMap
    val nextTs = mutable.Map(series.map(_ -> 0L): _*)
    var lastBatch: Map[String, Seq[(Long, Double)]] = Map.empty

    def mkBatch(sn: String, n: Int): Seq[(Long, Double)] =
      (1 to n).map { _ =>
        nextTs(sn) += 1 + rng.nextInt(300)
        (nextTs(sn), math.round(rng.nextDouble() * 1e4) / 100.0)
      }

    for (step <- 1 to 30) {
      rng.nextInt(6) match {
        case 0 => remote.down = !remote.down // outage boundary can fall anywhere
        case 1 | 2 => // single-series write through the reflector
          val sn = series(rng.nextInt(series.size))
          val batch = mkBatch(sn, 1 + rng.nextInt(25))
          r.writePoints("d", "m", sn, batch.toDF("time_ns", "v"))
          batch.foreach { case (ts, v) => model(sn)(ts) = v }
          lastBatch = Map(sn -> batch)
        case 3 => // multi-series micro-batch, replayed once at-least-once
          val batches = series.map(sn => sn -> mkBatch(sn, 1 + rng.nextInt(15))).toMap
          val df = batches.toSeq.flatMap { case (sn, b) =>
            b.map { case (ts, v) => (sn, ts, v) }
          }.toDF("series", "time_ns", "v")
          r.writeBatch("d", "m", df)
          if (rng.nextBoolean()) r.writeBatch("d", "m", df) // redelivery no-op
          batches.foreach { case (sn, b) =>
            b.foreach { case (ts, v) => model(sn)(ts) = v } }
          lastBatch = batches
        case 4 => // flush attempt; with the remote down it must fail WHOLE
          if (!remote.down) r.flush("d", "m")
          else if (series.exists(sn => r.spooled("d", "m", sn)))
            intercept[java.io.IOException](r.flush("d", "m"))
        case 5 => // idempotent replay of the last single/multi batch
          lastBatch.foreach { case (sn, b) =>
            r.writePoints("d", "m", sn, b.toDF("time_ns", "v"))
          }
      }
      // invariant: remote + spool together hold exactly the model's points
      // (distinct union — a redelivery arriving after the remote went down
      // legitimately leaves a transient spool copy of a remotely-landed
      // batch; the values must still agree, and the final flush below
      // proves convergence back to exactly-once)
      if (step % 10 == 0) {
        series.foreach { sn =>
          val rem = if (remoteT.listSeries("rd", "m").contains(sn))
            remoteT.select("rd", "m", sn, Nil, 0L, Long.MaxValue - 1).collect()
              .map(x => (x.getLong(0), x.getDouble(1))).toSeq else Nil
          val loc = if (localT.listSeries("d", "m").contains(sn))
            localT.select("d", "m", sn, Nil, 0L, Long.MaxValue - 1).collect()
              .map(x => (x.getLong(0), x.getDouble(1))).toSeq else Nil
          assert((rem ++ loc).distinct.sorted == model(sn).toSeq,
            s"step $step series $sn: remote ${rem.size} + spool ${loc.size}")
        }
      }
    }
    // end of soak: recover, drain, and the remote holds everything
    remote.down = false
    r.flush("d", "m")
    series.foreach { sn =>
      val rem = remoteT.select("rd", "m", sn, Nil, 0L, Long.MaxValue - 1)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(rem == model(sn).toSeq, s"final drain of $sn")
      assert(!r.spooled("d", "m", sn))
    }
  }
}
