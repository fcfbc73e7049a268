package graft

import graft.engine._
import graft.streaming.{FaultInjectedRemote, Reflector, ReflectorRemote}
import org.apache.spark.sql.DataFrame

/** Store-and-forward reflector semantics (reference tsdbserver/reflector.cc,
  * doc/REFLECTOR.txt): pass-through when healthy, spool when the remote is
  * down OR a backlog exists, drain-and-delete on flush, idempotent replay
  * when a flush crashes between the remote write and the local delete. */
class ReflectorSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = MeasurementSchema(Seq(Field("v", FieldType.F64)))

  private def mk(): (Tsdb, Tsdb, FaultInjectedRemote, Reflector) = {
    val localT = new Tsdb(spark, tmpDir("refl-local-"), requestedBucketWidth = 100L)
    val remoteT = new Tsdb(spark, tmpDir("refl-remote-"), requestedBucketWidth = 100L)
    localT.createDatabase("sensor_data")
    localT.createMeasurement("sensor_data", "points", schema)
    val flaky = new FaultInjectedRemote(ReflectorRemote(remoteT))
    val r = new Reflector(localT, flaky, Map("sensor_data" -> "logger_xyz"))
    r.syncSchemas()
    (localT, remoteT, flaky, r)
  }

  private def pts(rows: (Long, Double)*): DataFrame =
    rows.toSeq.toDF("time_ns", "v")

  private def times(t: Tsdb, db: String): Seq[Long] =
    t.select(db, "points", "s1", Nil, 0L, Long.MaxValue - 1)
      .collect().map(_.getLong(0)).toSeq

  test("syncSchemas mirrors local measurements; diverged remote schema rejects") {
    val (_, remoteT, _, r) = mk()
    assert(remoteT.getSchema("logger_xyz", "points") == schema)
    r.syncSchemas() // idempotent re-run
    // a remote measurement whose schema drifted must surface, not corrupt
    remoteT.createMeasurement("logger_xyz", "extra",
      MeasurementSchema(Seq(Field("w", FieldType.I64))))
    r.local.createMeasurement("sensor_data", "extra",
      MeasurementSchema(Seq(Field("w", FieldType.F32))))
    intercept[MeasurementExistsException](r.syncSchemas())
  }

  test("healthy remote: writes pass through, nothing spools") {
    val (localT, remoteT, _, r) = mk()
    val (res, viaRemote) = r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0), (200L, 2.0)))
    assert(viaRemote && res.written == 2)
    assert(times(remoteT, "logger_xyz") == Seq(100L, 200L))
    assert(!r.spooled("sensor_data", "points", "s1"))
    assert(localT.listSeries("sensor_data", "points").isEmpty)
  }

  test("unmapped database rejects like the reference's no_such_database") {
    val (_, _, _, r) = mk()
    intercept[NoSuchDatabaseException](
      r.writePoints("other_db", "points", "s1", pts((1L, 1.0))))
  }

  test("remote down: writes spool locally; backlog keeps spooling after recovery") {
    val (localT, remoteT, flaky, r) = mk()
    flaky.down = true
    val (res1, via1) = r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0)))
    assert(!via1 && res1.written == 1)
    assert(r.spooled("sensor_data", "points", "s1"))
    assert(times(localT, "sensor_data") == Seq(100L))
    // remote comes back, but the backlog must drain FIRST — the engine
    // appends monotonically, so 200 cannot land remotely before 100
    flaky.down = false
    val (_, via2) = r.writePoints("sensor_data", "points", "s1", pts((200L, 2.0)))
    assert(!via2)
    assert(times(localT, "sensor_data") == Seq(100L, 200L))
    assert(remoteT.listSeries("logger_xyz", "points").isEmpty)
  }

  test("flush drains the spool to the remote, deletes locally, then resumes pass-through") {
    val (localT, remoteT, flaky, r) = mk()
    flaky.down = true
    r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0), (150L, 1.5)))
    r.writePoints("sensor_data", "points", "s2", pts((120L, 9.0)))
    flaky.down = false
    assert(r.flush("sensor_data", "points") == Map("s1" -> 2L, "s2" -> 1L))
    assert(times(remoteT, "logger_xyz") == Seq(100L, 150L))
    assert(!r.spooled("sensor_data", "points", "s1"))
    assert(!r.spooled("sensor_data", "points", "s2"))
    // spool physically drained: no visible points remain
    assert(localT.visible("sensor_data", "points").count() == 0)
    // empty flush is a no-op
    assert(r.flush("sensor_data", "points") == Map.empty)
    // next write passes through and appends above the flushed range
    val (_, via) = r.writePoints("sensor_data", "points", "s1", pts((300L, 3.0)))
    assert(via)
    assert(times(remoteT, "logger_xyz") == Seq(100L, 150L, 300L))
  }

  test("crashed flush (remote written, local delete lost) replays idempotently") {
    val (localT, remoteT, flaky, r) = mk()
    flaky.down = true
    r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0), (150L, 1.5)))
    flaky.down = false
    // crash simulation: the remote write of a flush landed, the local
    // delete did not — re-running flush must verify the replay bitwise
    // (0 appended remotely) and still drain the spool
    remoteT.writeBatch("logger_xyz", "points",
      localT.visible("sensor_data", "points")
        .drop(MeasurementSchema.BucketCol))
    val flushed = r.flush("sensor_data", "points")
    assert(flushed == Map("s1" -> 2L)) // written + overwriteVerified
    assert(times(remoteT, "logger_xyz") == Seq(100L, 150L))
    assert(localT.visible("sensor_data", "points").count() == 0)
  }

  test("late points below a flushed watermark are discarded, not reordered") {
    val (_, remoteT, flaky, r) = mk()
    flaky.down = true
    r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0)))
    flaky.down = false
    r.flush("sensor_data", "points")
    // a sensor replaying old data after the flush: below the remote
    // watermark with different bytes -> the engine's overlap verify rejects;
    // identical bytes replay to a no-op
    val (res, via) = r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0)))
    assert(via && res.written == 0 && res.overwriteVerified == 1)
  }

  test("remote VALIDATION rejection surfaces instead of spooling (corruption is not 'down')") {
    val (localT, remoteT, _, r) = mk()
    r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0)))
    // a replay whose bytes DIFFER: the remote engine rejects it — the
    // reflector must rethrow, not quietly spool the poison point and leave
    // every later flush permanently stuck behind it
    intercept[OverwriteMismatchException](
      r.writePoints("sensor_data", "points", "s1", pts((100L, 9.9))))
    assert(localT.listSeries("sensor_data", "points").isEmpty) // nothing spooled
    // same discrimination on the batch path
    intercept[OverwriteMismatchException](
      r.writeBatch("sensor_data", "points",
        Seq(("s1", 100L, 9.9)).toDF("series", "time_ns", "v")))
    assert(localT.listSeries("sensor_data", "points").isEmpty)
    assert(times(remoteT, "logger_xyz") == Seq(100L)) // storage untouched
  }

  test("writeBatch routes per series: backlogged spool, clean pass through") {
    val (localT, remoteT, flaky, r) = mk()
    // s1 acquires a backlog while the remote is down
    flaky.down = true
    r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0)))
    flaky.down = false
    // one micro-batch carrying both series: s1 must stay local (ordering),
    // s2 goes remote — at most one writeBatch per side
    val batch = Seq(("s1", 200L, 2.0), ("s2", 120L, 9.0))
      .toDF("series", "time_ns", "v")
    val res = r.writeBatch("sensor_data", "points", batch)
    assert(res("s1") == (WriteResult(1, 0, 0), false))
    assert(res("s2") == (WriteResult(1, 0, 0), true))
    assert(times(localT, "sensor_data") == Seq(100L, 200L))
    assert(remoteT.select("logger_xyz", "points", "s2", Nil, 0L, 1000L)
      .collect().map(_.getLong(0)).toSeq == Seq(120L))
    // remote down again: the whole batch spools, both series
    flaky.down = true
    val res2 = r.writeBatch("sensor_data", "points",
      Seq(("s1", 300L, 3.0), ("s2", 130L, 9.5)).toDF("series", "time_ns", "v"))
    assert(res2.values.forall(!_._2))
    assert(r.spooled("sensor_data", "points", "s2"))
  }

  test("streaming through the reflector: outage spools, flush drains, recovery passes through") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val (localT, remoteT, flaky, r) = mk()
    val srcDir = tmpDir("refl-src-")
    val ckpt = tmpDir("refl-ckpt-")
    val srcSchema = StructType(Seq(
      StructField("series", StringType), StructField("time_ns", LongType),
      StructField("v", DoubleType)))
    def drain(): Unit = {
      val q = r.startStream("sensor_data", "points",
        spark.readStream.schema(srcSchema).json(srcDir), "series", ckpt)
      q.awaitTermination(60000); assert(!q.isActive)
    }
    def src(name: String, rows: Seq[(String, Long, Double)]): Unit =
      Files.writeString(Paths.get(srcDir, name), rows.map { case (s, t, v) =>
        s"""{"series":"$s","time_ns":$t,"v":$v}""" }.mkString("", "\n", "\n"))

    // drain 1 while the upstream is down: everything spools
    flaky.down = true
    src("f1.json", (1L to 30L).map(i => ("s1", i * 10, i.toDouble)))
    drain()
    assert(remoteT.listSeries("logger_xyz", "points").isEmpty)
    assert(r.spooled("sensor_data", "points", "s1"))
    // upstream recovers; flush, then drain new data straight through
    flaky.down = false
    r.flush("sensor_data", "points")
    src("f2.json", (31L to 40L).map(i => ("s1", i * 10, i.toDouble)))
    drain()
    assert(!r.spooled("sensor_data", "points", "s1"))
    assert(localT.visible("sensor_data", "points").count() == 0)
    assert(times(remoteT, "logger_xyz") == (1L to 40L).map(_ * 10))
  }

  test("flushAll sweeps every mapped database and measurement") {
    val (localT, remoteT, flaky, r) = mk()
    localT.createMeasurement("sensor_data", "aux", schema)
    remoteT.createMeasurement("logger_xyz", "aux", schema)
    flaky.down = true
    r.writePoints("sensor_data", "points", "s1", pts((100L, 1.0)))
    flaky.down = false
    localT.writePoints("sensor_data", "aux", "s7", pts((50L, 5.0)))
    assert(r.flushAll() == Map(
      ("sensor_data", "points", "s1") -> 1L,
      ("sensor_data", "aux", "s7") -> 1L))
    assert(times(remoteT, "logger_xyz") == Seq(100L))
    assert(remoteT.select("logger_xyz", "aux", "s7", Nil, 0L, 1000L)
      .collect().map(_.getLong(0)).toSeq == Seq(50L))
  }

  test("capped flush drains a large spool oldest-first in bounded rounds") {
    val (localT, remoteT, flaky, r) = mk()
    flaky.down = true
    // 12 points per series over buckets [0,100)..[500,600) — 24 points total
    val s1 = (0 until 12).map(i => (i * 50L, i * 1.0))
    val s2 = (0 until 12).map(i => (i * 50L + 1L, i * 2.0))
    r.writePoints("sensor_data", "points", "s1", pts(s1: _*))
    r.writePoints("sensor_data", "points", "s2", pts(s2: _*))
    flaky.down = false
    // cap 5: each bucket holds 4 points (2 per series), so rounds take ONE
    // whole bucket each (4 <= 5, 8 > 5) -> 6 rounds to drain
    var rounds = 0
    var total = Map.empty[String, Long]
    var got = r.flush("sensor_data", "points", maxPoints = Some(5L))
    while (got.nonEmpty) {
      rounds += 1
      assert(got.values.sum <= 5L, s"round $rounds exceeded the cap: $got")
      total = got.foldLeft(total) { case (t, (sn, n)) =>
        t.updated(sn, t.getOrElse(sn, 0L) + n) }
      // mid-drain ordering: the spool still holds the NEWER points, so a
      // fresh write must keep routing local (backlog order preserved)
      if (rounds == 1) {
        assert(r.spooled("sensor_data", "points", "s1"))
        assert(times(remoteT, "logger_xyz") == Seq(0L, 50L)) // s1's first bucket
      }
      got = r.flush("sensor_data", "points", maxPoints = Some(5L))
    }
    assert(rounds == 6 && total == Map("s1" -> 12L, "s2" -> 12L))
    // final state identical to an uncapped flush: remote holds everything
    // in order, spool is empty
    assert(times(remoteT, "logger_xyz") == s1.map(_._1))
    assert(localT.visible("sensor_data", "points").count() == 0L)
    // flushAll with a cap reaches the same fixed point in one sweep
    flaky.down = true
    r.writePoints("sensor_data", "points", "s1", pts((900L, 9.0), (1100L, 11.0)))
    flaky.down = false
    assert(r.flushAll(maxPoints = Some(1L)) ==
      Map(("sensor_data", "points", "s1") -> 2L))
    assert(localT.visible("sensor_data", "points").count() == 0L)
  }

  test("flushAll round bound leaves the residual to the next sweep (no starvation)") {
    val (localT, _, flaky, r) = mk()
    flaky.down = true
    // three buckets spooled; cap 1 point/round + maxRounds 2 -> one sweep
    // may only drain two buckets, the third stays for the next sweep (the
    // bound exists so a sustained writer cannot pin the sweep on one
    // measurement forever)
    r.writePoints("sensor_data", "points", "s1",
      pts((50L, 1.0), (150L, 2.0), (250L, 3.0)))
    flaky.down = false
    val first = r.flushAll(maxPoints = Some(1L), maxRounds = 2)
    assert(first == Map(("sensor_data", "points", "s1") -> 2L))
    assert(localT.visible("sensor_data", "points").count() == 1L) // residual
    assert(r.spooled("sensor_data", "points", "s1"))
    val second = r.flushAll(maxPoints = Some(1L), maxRounds = 2)
    assert(second == Map(("sensor_data", "points", "s1") -> 1L))
    assert(localT.visible("sensor_data", "points").count() == 0L)
  }
}
