package graft.tools

import org.apache.spark.sql.SparkSession

/** SemDeDup scale measurement with k GROWING ∝ corpus (VERDICT r12 #2):
  * the registered `dedup_semantic` runs at fixed k = 16, which the
  * ScaleBench gate must exclude — GenScale's embedding replicas are
  * cosine-1.0 duplicates, so at fixed k the within-cluster pair volume
  * grows factor² on this data by construction. The published SemDeDup
  * recipe holds the per-cluster population m = N/k roughly CONSTANT by
  * growing the cluster count with the corpus; then total pair work
  * k·m² = N·m is linear in N. This tool measures exactly that claim:
  * semanticDedup at (sf dir, k) vs (factor× dir, k·factor), wall ratio
  * expected ≲ factor.
  *
  * Usage: runMain graft.tools.SemDedupScale [sfDir] [factor] [baseK]
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val baseK = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val scaled = s"/tmp/graft-semscale-x$factor"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = false // exit AFTER the finally cleanup, never inside the try
    try {
      GenScale.generate(spark, src, scaled, factor)
      def run(dir: String, k: Int): Double = {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.ops.DedupOps.semanticDedup(
            graft.tables.Tables(spark, dir, "embeddings"),
            "vec_id", "embedding", k = k, threshold = 0.4)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(src, baseK) // warm-up: codegen + parquet reader init, untimed
      val base = run(src, baseK)
      val big = run(scaled, baseK * factor)
      val ratio = big / base
      println(f"dedup_semantic k∝corpus  base(k=$baseK)=$base%7.2fs " +
        f"x$factor(k=${baseK * factor})=$big%8.2fs ratio=$ratio%6.2f" +
        (if (ratio > factor) "  <-- SUPER-LINEAR" else ""))
      failed = ratio > factor
    } finally {
      try {
        val root = java.nio.file.Paths.get(scaled)
        if (java.nio.file.Files.isDirectory(root)) {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally walk.close()
        }
      } catch { case _: Throwable => () }
      spark.stop()
    }
    if (failed) sys.exit(1)
  }
}
