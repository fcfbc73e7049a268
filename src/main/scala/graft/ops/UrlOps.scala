package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain curation — the provenance stages of a crawl pipeline: parse
  * the URL into scheme/host/path (pure map-side regex, Java∩RE2 subset so
  * the oracle replays it) and enforce PER-DOMAIN QUOTAS (cap how many
  * documents any single domain contributes — the standard defense against
  * boilerplate mills dominating a corpus).
  *
  * The quota operator is where scale thinking lives: "keep the Q
  * lowest-id docs per domain" is a top-Q-per-key, and a naive
  * `row_number() OVER (PARTITION BY domain)` sorts EVERY doc of a domain
  * in one task — a 100M-doc hot domain becomes one straggler. So the
  * quota runs in two bounded stages: stage 1 ranks within (domain, salt)
  * — each salt bucket holds ~1/S of the domain — and keeps only ranks ≤
  * Q (sound: rank > Q within a salt implies ≥ Q smaller ids in the SAME
  * domain, so the global rank is > Q too); stage 2 ranks the ≤ S·Q
  * survivors per domain exactly. No window ever sees more than
  * max(n/S, S·Q) rows per key. */
object UrlOps {

  /** Deterministic per-doc URL with a PLANTED HOT DOMAIN: d0 gets every
    * 3rd doc (plus %23 aliasing), the rest spread over d1..d22 — so the
    * quota genuinely bites and the skew path genuinely runs. Every 2nd
    * URL carries a query string the path parse must strip. */
  def urlFixture(docId: Column): Column =
    concat(
      lit("https://"),
      when(pmod(docId, lit(3)) === 0, lit("d0"))
        .otherwise(concat(lit("d"), pmod(docId, lit(23)).cast("string"))),
      lit(".example.com/p/"), docId.cast("string"),
      when(pmod(docId, lit(2)) === 0, lit("?utm=x")).otherwise(lit("")))

  /** Group 1 = host, group 2 = path (query/fragment excluded). */
  val UrlRe = "^https?://([A-Za-z0-9.-]+)(/[^?#]*)?"

  def host(url: Column): Column = regexp_extract(url, UrlRe, 1)
  def path(url: Column): Column = regexp_extract(url, UrlRe, 2)

  /** Top-Q-per-domain quota (lowest `idCol` wins — deterministic), salted
    * two-stage as per the object scaladoc. Returns every input row with
    * `rk` (1-based rank for kept rows, 0 otherwise) and `kept`. */
  def domainQuota(docs: DataFrame, idCol: String, domainCol: String,
                  quota: Int, salts: Int = 32): DataFrame = {
    require(quota >= 1 && salts >= 1)
    val w1 = Window.partitionBy(col(domainCol), pmod(col(idCol), lit(salts)))
      .orderBy(col(idCol))
    val stage1 = docs.select(col(idCol), col(domainCol))
      .withColumn("_rk1", row_number().over(w1))
      .filter(col("_rk1") <= quota)
      .drop("_rk1")
    val w2 = Window.partitionBy(col(domainCol)).orderBy(col(idCol))
    val kept = stage1
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= quota)
    docs.select(col(idCol), col(domainCol))
      .join(kept.select(col(idCol), col("rk")), Seq(idCol), "left")
      .select(col(idCol), col(domainCol),
        coalesce(col("rk"), lit(0L)).as("rk"),
        col("rk").isNotNull.as("kept"))
  }
}
