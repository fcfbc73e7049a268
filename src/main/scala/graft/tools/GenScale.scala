package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build a `factor`× scale-up of a driver testdata dir for the
  * self-scaling bench (README "sf1" table). Replication rules are chosen so
  * per-query WORK scales ~linearly instead of super-linearly:
  *
  *  - events: each replica r shifts `ts` by r·(span + 1 day) and offsets
  *    `event_id` — every series grows factor× in points over a factor×
  *    longer horizon (the append-only growth direction; strictly-increasing
  *    per-series timestamps are preserved).
  *  - documents: `doc_id` offset per replica and a replica-unique token
  *    appended to `text` — WITHIN-replica near-dup structure is preserved
  *    while cross-replica pairs cannot form (verbatim replicas would square
  *    the pair count: a k-cluster would become a factor·k-cluster and the
  *    Jaccard join would grow factor², not factor).
  *  - embeddings: `vec_id` offset and a deterministic per-replica sign-flip
  *    pattern over the dimensions — norms and within-replica cosines are
  *    EXACTLY preserved (sign flips are an isometry), cross-replica cosines
  *    decorrelate.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <outDir> [factor=10]
  */
object GenScale {
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
    import spark.implicits._

    val reps = spark.range(0, factor).select(col("id").as("_r"))

    val ev = spark.read.parquet(s"$src/events.parquet")
    val Array(mn, mx) = ev.agg(min("ts"), max("ts")).as[(Long, Long)]
      .collect().map(t => Array(t._1, t._2)).head
    val span = (mx - mn) + 86400000000000L // + 1 day of ns headroom
    ev.crossJoin(broadcast(reps))
      .select((col("event_id") + col("_r") * 1000000000000L).as("event_id"),
        (col("ts") + col("_r") * span).as("ts"),
        col("event_type"), col("value"))
      .repartition(16).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docCols = Seq(
      (col("doc_id") + col("_r") * 1000000000L).as("doc_id"),
      concat(col("text"), lit(" zz"), col("_r").cast("string")).as("text")) ++
      docs.columns.filter(c => c != "doc_id" && c != "text").map(col)
    docs.crossJoin(broadcast(reps))
      .select(docCols: _*)
      .repartition(16).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(reps))
      .select((col("vec_id") + col("_r") * 10000000L).as("vec_id"),
        col("label"),
        // sign flip dim i of replica r iff bit (i + r) of a fixed pattern:
        // deterministic, norm-preserving, replica-decorrelating
        zip_with(col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1),
            i => when(((i + col("_r")) % 3 === 0) || ((i * col("_r")) % 7 === 1),
              lit(-1.0f)).otherwise(lit(1.0f))),
          (x, s) => x * s).as("embedding"))
      .repartition(8).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/embeddings.parquet")

    println(s"GenScale: $src -> $out x$factor  " +
      s"events=${spark.read.parquet(s"$out/events.parquet").count()} " +
      s"documents=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"embeddings=${spark.read.parquet(s"$out/embeddings.parquet").count()}")
    spark.stop()
  }
}
