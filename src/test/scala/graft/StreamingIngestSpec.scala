package graft

import java.nio.file.{Files, Paths}
import graft.engine._
import graft.streaming.StreamingIngest
import org.apache.spark.sql.types._

/** Streaming ingest semantics: checkpointed file-source ingest with restart
  * (replaces the reference's WAL crash-recovery snapshots, SURVEY.md §5.3),
  * and exactly-once-under-replay via the bitwise idempotent overwrite. */
class StreamingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = MeasurementSchema(Seq(Field("v", FieldType.F64)))
  private val srcSchema = StructType(Seq(
    StructField("series", StringType), StructField("time_ns", LongType),
    StructField("v", DoubleType)))

  private def writeSrcFile(dir: String, name: String,
                           rows: Seq[(String, Long, Double)]): Unit = {
    val json = rows.map { case (s, t, v) =>
      s"""{"series":"$s","time_ns":$t,"v":$v}"""
    }.mkString("", "\n", "\n")
    Files.writeString(Paths.get(dir, name), json)
  }

  private def visiblePoints(t: Tsdb): Seq[(String, Long, Double)] =
    t.visible("db", "m").select("series", "time_ns", "v")
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("file-source ingest: AvailableNow drains, restart picks up only new files") {
    val t = new Tsdb(spark, tmpDir("stream-tsdb-"), requestedBucketWidth = 100L)
    t.createDatabase("db"); t.createMeasurement("db", "m", schema)
    val srcDir = tmpDir("stream-src-")
    val ckpt = tmpDir("stream-ckpt-")

    val batch1 = (1L to 50L).map(i => ("s1", i * 10, i.toDouble))
    writeSrcFile(srcDir, "f1.json", batch1)
    def run(): Unit = {
      val q = StreamingIngest.start(t, "db", "m",
        spark.readStream.schema(srcSchema).json(srcDir), "series", ckpt)
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    run()
    assert(visiblePoints(t) == batch1)

    // "crash" boundary: the query is gone; a second run from the SAME
    // checkpoint must ingest only the new file — no duplicates, no misses.
    val batch2 = (51L to 80L).map(i => ("s1", i * 10, i.toDouble)) ++
      (1L to 20L).map(i => ("s2", i * 10, -i.toDouble))
    writeSrcFile(srcDir, "f2.json", batch2)
    run()
    assert(visiblePoints(t) == (batch1 ++ batch2).sortBy(r => (r._1, r._2)))

    // LAST N across the committed+streamed boundary (reference trims the WAL
    // first, server.cc:782-789; here the unified table just answers):
    // the newest streamed points win, emitted ascending
    val last3 = t.select("db", "m", "s1", Seq("v"), 0L, Long.MaxValue - 1, last = Some(3))
      .collect().map(_.getLong(0)).toSeq
    assert(last3 == Seq(780L, 790L, 800L))
  }

  test("replayed micro-batch is exactly-once: identical replay no-ops, divergent replay rejected") {
    val t = new Tsdb(spark, tmpDir("replay-tsdb-"), requestedBucketWidth = 100L)
    t.createDatabase("db"); t.createMeasurement("db", "m", schema)
    val rows = (1L to 30L).map(i => ("s1", i * 10, i.toDouble))
    val batch = rows.toDF("series", "time_ns", "v")

    StreamingIngest.ingestBatch(t, "db", "m", "series")(batch, 0L)
    assert(visiblePoints(t) == rows)

    // at-least-once redelivery of the same batch: verified no-op
    StreamingIngest.ingestBatch(t, "db", "m", "series")(batch, 0L)
    assert(visiblePoints(t) == rows)

    // a replay whose bytes differ from committed storage must be refused
    val divergent = rows.map { case (s, ts, v) =>
      (s, ts, if (ts == 200L) v + 0.5 else v)
    }.toDF("series", "time_ns", "v")
    intercept[OverwriteMismatchException] {
      StreamingIngest.ingestBatch(t, "db", "m", "series")(divergent, 0L)
    }
    assert(visiblePoints(t) == rows) // storage untouched by the failed write
  }

  test("a micro-batch of N series runs O(1) Spark jobs, not O(N)") {
    val t = new Tsdb(spark, tmpDir("batch-tsdb-"), requestedBucketWidth = 1000L)
    t.createDatabase("db"); t.createMeasurement("db", "m", schema)
    val nSeries = 24
    val rows = for (s <- 0 until nSeries; i <- 1L to 10L)
      yield (f"s$s%03d", i * 10, s + i.toDouble)
    val batch = rows.toDF("series", "time_ns", "v")
    def jobsDuring(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val fresh = jobsDuring("ingest-fresh") {
      StreamingIngest.ingestBatch(t, "db", "m", "series")(batch, 0L)
    }
    assert(fresh < nSeries / 2, s"fresh batch of $nSeries series ran $fresh jobs")
    assert(t.listSeries("db", "m").size == nSeries)
    // full replay: adds the distributed verify, still far from O(N)
    val replay = jobsDuring("ingest-replay") {
      StreamingIngest.ingestBatch(t, "db", "m", "series")(batch, 0L)
    }
    assert(replay < nSeries / 2, s"replayed batch of $nSeries series ran $replay jobs")
    assert(t.visible("db", "m").count() == rows.size)
  }
}
