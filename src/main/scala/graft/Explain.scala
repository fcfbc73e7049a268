package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of selected registered
  * queries (plan-audit loop — pushdown/pruning/broadcast/codegen checks).
  * Usage: runMain graft.Explain <sfDir> [queryName ...] (default: headline
  * set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("tsdb_select_range", "tsdb_window_sum", "tsdb_integral",
        "q_join_agg", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "ann_topk", "ann_lsh", "dedup_embedding", "text_stats",
        "tsdb_asof_join", "tsdb_range_join", "text_keywords",
        "tsdb_quantile", "tsdb_histogram", "tsdb_rate",
        "tsdb_integral_multi", "text_top_terms", "text_vocab",
        "dedup_ngram_jaccard_capped", "dedup_contamination",
        "pipeline_pack", "pipeline_chunk", "pipeline_mixture",
        "pipeline_cluster", "text_filter", "tsdb_gap_fill",
        "dedup_semantic", "mm_video_frames")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
