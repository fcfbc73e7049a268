package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build a `factor`× scale-up of a driver testdata dir for the
  * self-scaling bench (README "sf1" table). Replication rules are chosen so
  * per-query WORK scales ~linearly instead of super-linearly:
  *
  *  - events: each replica r shifts `ts` by r·(span + 1 day) and offsets
  *    `event_id`; every other column rides along unchanged — every series
  *    grows factor× in points over a factor× longer horizon (the
  *    append-only growth direction; strictly-increasing per-series
  *    timestamps are preserved).
  *  - documents: `doc_id` offset per replica and EVERY token prefixed with
  *    a LETTERS-ONLY replica tag (`z<base26(r)>q<token>`). The prefix map
  *    is a fixed-width injection on tokens, so within-replica shingle-set
  *    relations — and therefore the whole near-dup pair structure — are
  *    preserved exactly, while tokens of different replicas can never
  *    collide: cross-replica Jaccard is 0 and the pair count grows exactly
  *    factor×. (A single APPENDED tag does not work: replicas of a T-word
  *    doc would still share T−2 of T shingles, J=(T−2)/T ≥ 0.8 for T ≥ 10
  *    — every doc would pair with its own replicas and the pair count
  *    would grow factor². A tag CONTAINING A DIGIT does not work either:
  *    the [a-z]+ tokenizer splits on it, see the call-site comment.)
  *  - embeddings: `vec_id` offset and a deterministic per-replica sign
  *    flip of a hashed dimension subset — norms and within-replica cosines
  *    are EXACTLY preserved (sign flips are an isometry). NOTE cosine
  *    pair-thresholding does NOT scale linearly on this data regardless of
  *    the flip pattern: decorrelated cross-replica pairs still cross a
  *    loose threshold at the data's baseline random-pair rate (~4.6e-4 at
  *    0.4), so pair-output-bound queries over embeddings grow ~factor².
  *    That is cosine-distribution physics, not an operator property — the
  *    scale bench documents it instead of hiding it.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <outDir> [factor=10]
  */
object GenScale {

  /** Per-replica `doc_id` stride — the fixture-id-space contract is owned
    * by the ops layer (query semantics must not depend on a tools/
    * constant); the scaler consumes it. */
  val DocIdStride: Long = graft.ops.MultimodalOps.DocIdStride
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor)
    spark.stop()
  }

  /** Build the scaled dir (see class doc for the replication rules). */
  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    import spark.implicits._

    val reps = spark.range(0, factor).select(col("id").as("_r"))

    def replicated(table: String)(cols: (String, org.apache.spark.sql.Column)*): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val overrides = cols.toMap
      val outCols = df.columns.toSeq.map(c =>
        overrides.getOrElse(c, col(c)).as(c))
      df.crossJoin(broadcast(reps))
        .select(outCols: _*)
        .repartition(16).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$table.parquet")
    }

    // `ts` ships either as ns-as-long (legacy) or µs timestamp — shift in
    // the native unit and keep the source's physical type in the output so
    // the scaled dir is a drop-in replacement for a driver dir
    val ev = spark.read.parquet(s"$src/events.parquet")
    val tsType = ev.schema("ts").dataType
    val tsIsLong = tsType == org.apache.spark.sql.types.LongType
    val tsUs =
      if (tsIsLong) expr("ts div 1000") else unix_micros(col("ts").cast("timestamp"))
    val Array(mn, mx) = ev.agg(min(tsUs), max(tsUs)).as[(Long, Long)]
      .collect().map(t => Array(t._1, t._2)).head
    val spanUs = (mx - mn) + 86400000000L // + 1 day of µs headroom
    val shiftedTs =
      if (tsIsLong) col("ts") + col("_r") * (spanUs * 1000L)
      else timestamp_micros(tsUs + col("_r") * spanUs).cast(tsType)
    replicated("events")(
      "event_id" -> (col("event_id") + col("_r") * 1000000000000L),
      "ts" -> shiftedTs)

    replicated("documents")(
      "doc_id" -> (col("doc_id") + col("_r") * DocIdStride),
      // bijective per-replica token prefix: within-replica dup structure
      // preserved exactly, cross-replica token collisions impossible;
      // replica 0 is the untouched source. The tag must be LOWERCASE
      // LETTERS ONLY: the text operators tokenize with [a-z]+ (TextOps
      // .tokens), so a digit in the tag (the first cut of this tool used
      // z<r>q) splits every token into a constant "z" plus a digit-free
      // suffix SHARED BY ALL REPLICAS — replicas 1..N-1 became exact
      // token-stream duplicates of each other and every pair/cluster query
      // went quadratic in the replica count. Base-26 two-letter tag keeps
      // the map a fixed-width injection for factors up to 676.
      "text" -> when(col("_r") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("z"), expr("chr(97 + _r div 26)"),
            expr("chr(97 + pmod(_r, 26))"), lit("q$1")))))

    replicated("embeddings")(
      "vec_id" -> (col("vec_id") + col("_r") * 10000000L),
      "embedding" -> zip_with(col("embedding"),
        transform(sequence(lit(0), size(col("embedding")) - 1),
          i => when(col("_r") =!= 0 && pmod(hash(i, col("_r")), lit(2)) === 0,
            lit(-1.0f)).otherwise(lit(1.0f))),
        (x, s) => x * s))

    println(s"GenScale: $src -> $out x$factor  " +
      s"events=${spark.read.parquet(s"$out/events.parquet").count()} " +
      s"documents=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"embeddings=${spark.read.parquet(s"$out/embeddings.parquet").count()}")
  }
}
