package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic main (r19): fine-grained frontier construction cost. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.{RobotsOps, UrlOps}
    import spark.implicits._
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val curl = t("s1 curl select") {
        graft.tables.Tables(spark, sfDir, "documents")
          .select(col("doc_id"),
            UrlOps.canonicalize(UrlOps.urlVariantFixture(col("doc_id"))).as("curl"))
      }
      val base = t("s2 domain/path/rv select") {
        curl.select(col("doc_id"),
          UrlOps.registrableDomain(UrlOps.host(col("curl"))).as("domain"),
          UrlOps.path(col("curl")).as("path"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(0L))
            .otherwise(pmod(pmod(col("doc_id"), lit(23)), lit(3))).as("rv"))
      }
      val typed = t("s3 as[tuple]") { base.as[(Long, String, String, Long)] }
      val mapped = t("s4 map+toDF") {
        typed.map { case (id, dom, path, rv) => (id, dom, path, rv == 0L) }
          .toDF("doc_id", "domain", "path", "allowed")
      }
      val evald = t("s5 persist") {
        mapped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      val q = t("s6 domainQuota") {
        UrlOps.domainQuota(evald.filter(col("allowed")), "doc_id", "domain",
          quota = 10, salts = 8)
      }
      val full = t("s7 final join") {
        evald.join(q.select(col("doc_id"), col("rk"), col("kept")),
          Seq("doc_id"), "left")
      }
      t("s8 noop save") {
        full.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      evald.unpersist()
    }
    spark.stop()
  }
}
