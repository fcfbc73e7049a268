package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}
import graft.tables.Tables

/** Dev diagnostic: candidate-pair volume of the MinHash-LSH banding at a
  * given sf dir — the number that explains (or absolves) super-linear
  * scaling of every jaccardPairsLsh-based query. Not part of the library
  * surface. Usage: runMain graft.tools.LshDiag <sfDir> [bands rows]... */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val configs: Seq[(Int, Int)] =
      if (args.length > 1) args.drop(1).grouped(2).map(a => (a(0).toInt, a(1).toInt)).toSeq
      else Seq((32, 4))

    val shingles = DedupOps.shingleSets(Tables(spark, dir, "documents"), "doc_id", "text", 3)
      .localCheckpoint(false)
    val n = shingles.count()
    println(s"docs=$n dir=$dir")
    for ((bands, rows) <- configs) {
      val t0 = System.nanoTime()
      val sigs = shingles.select(col("doc_id").as("id"),
        TextOps.minHashSignature(col("shingles"), bands * rows).as("sig"))
      val bnd = sigs.select(col("id"), explode(TextOps.lshBands(col("sig"), bands, rows)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val occ = bnd.groupBy("band", "bucket").count()
      val stats = occ.agg(
        sum(expr("count * (count - 1) / 2")).as("cand"),
        max("count").as("maxOcc"),
        count(lit(1)).as("nBuckets")).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"bands=$bands%3d rows=$rows%2d candidates=${stats.getDouble(0)}%.3e " +
        f"maxBucket=${stats.getLong(1)}%d buckets=${stats.getLong(2)}%d (${dt}%.1f s)")
    }
    spark.stop()
  }
}
