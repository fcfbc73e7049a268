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

  // ---------------------------------------------------------------- canon

  /** Full URL split for canonicalization (fragment already stripped):
    * 1 scheme, 2 host, 3 ":port" (or ""), 4 path (or ""), 5 "?query"
    * (or ""). Java∩RE2 common subset so DuckDB replays it verbatim. */
  val UrlFullRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?(/[^?#]*)?(\\?[^#]*)?"

  /** Query parameters dropped by canonicalization: the analytics
    * decorations that alias one resource into many spellings. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref")
  val TrackingPrefix = "utm_"

  /** Percent-decode UNRESERVED octets only (RFC 3986 §2.3 / §6.2.2):
    * "%70" → "p"; reserved or non-ASCII octets keep their escape with the
    * hex uppercased (§6.2.2.1). Strict subset: escapes are assumed
    * well-formed two-hex-digit (the fixture's are; a crawl frontier runs
    * a validity filter before canonicalization). Octets ≥ 0x80 are gated
    * BEFORE the byte→string decode: a lone high byte is not valid UTF-8,
    * and while Spark's decode would yield a replacement char (failing the
    * unreserved match, escape kept), DuckDB's raises — so both engines
    * must skip the decode entirely for the escape to survive the oracle
    * replay (uppercase hex compares lexicographically = numerically, so
    * `hex < "80"` is the octet < 0x80 test). */
  def pctDecodeUnreserved(s: Column): Column = {
    val parts = split(s, "%", -1)
    aggregate(
      slice(parts, lit(2), size(parts) - 1),
      element_at(parts, 1),
      (acc, p) => {
        val hex = upper(substring(p, 1, 2))
        val ch = when(hex < "80", decode(unhex(hex), "UTF-8"))
        concat(acc,
          when(ch.rlike("^[A-Za-z0-9._~-]$"), ch)
            .otherwise(concat(lit("%"), hex)),
          substring(p, 3, Int.MaxValue))
      })
  }

  /** RFC 3986 §6 syntax-based normalization, the stage BEFORE any
    * domain-keyed dedup/quota — without it one resource under two
    * spellings double-counts (r15 verdict gap #6). The chain (replayed
    * verbatim by the DuckDB oracle): strip fragment; lowercase scheme +
    * host (§6.2.2.1); drop the scheme-default port (:80/http, :443/https,
    * §6.2.3); percent-decode unreserved octets in the path, uppercasing
    * kept escapes; empty path → "/"; drop tracking params
    * ([[TrackingParams]] + utm_*) and SORT the survivors (one key order —
    * beyond RFC 3986 but standard crawl-frontier practice, e.g. Apache
    * Nutch's urlnormalizer); empty query → no "?". Pure map-side —
    * nothing shuffles, canonicalization cost is one projection at scan
    * time even at 100 TB. */
  def canonicalize(url: Column): Column = {
    val u = element_at(split(url, "#", 2), 1)
    val scheme = lower(regexp_extract(u, UrlFullRe, 1))
    val hostL = lower(regexp_extract(u, UrlFullRe, 2))
    val port = regexp_extract(u, UrlFullRe, 3)
    val rawPath = regexp_extract(u, UrlFullRe, 4)
    val rawQ = regexp_extract(u, UrlFullRe, 5)
    val portC = when(
      (scheme === "https" && port === ":443") ||
        (scheme === "http" && port === ":80"), lit(""))
      .otherwise(port)
    val pathC = pctDecodeUnreserved(
      when(rawPath === "", lit("/")).otherwise(rawPath))
    // the p =!= "" leg drops the degenerate spellings ("?&a=1", bare "?")
    // so they collapse to the same canonical form as their clean twins —
    // without it a trailing "?" survived, violating the documented
    // empty-query → no-"?" rule
    val kept = filter(split(substring(rawQ, 2, Int.MaxValue), "&", -1), p => {
      val name = element_at(split(p, "=", 2), 1)
      p =!= "" && !(name.startsWith(TrackingPrefix) ||
        name.isin(TrackingParams.map(x => x: Any): _*))
    })
    val qC = when(rawQ === "" || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(kept), "&")))
    concat(scheme, lit("://"), hostL, portC, pathC, qC)
  }

  /** [[urlFixture]] with PLANTED SPELLING VARIANTS of the same resources
    * (doc_id % 6 picks one): upper-cased scheme+host with default port
    * and a tracking query, already-canonical, %-encoded path with :443,
    * mixed-case host with an unsorted query, tracking params interleaved
    * with real ones, fragment-only. [[canonicalize]] must collapse every
    * variant to one spelling — the domain-quota fixture, so the quota
    * genuinely sees one domain per (d0/dK), not a case-split of it. */
  def urlVariantFixture(docId: Column): Column = {
    val dPart = when(pmod(docId, lit(3)) === 0, lit("d0"))
      .otherwise(concat(lit("d"), pmod(docId, lit(23)).cast("string")))
    val hostLc = concat(dPart, lit(".example.com"))
    val hostUc = concat(upper(dPart), lit(".EXAMPLE.COM"))
    val hostMc = concat(dPart, lit(".Example.COM"))
    val p = concat(lit("/p/"), docId.cast("string"))
    // %70 decodes (unreserved "p"); %e9 is a high octet — not valid UTF-8
    // alone — which must survive as an UPPERCASED kept escape (%E9) without
    // either engine attempting the byte→string decode
    val pEnc = concat(lit("/%70%e9/"), docId.cast("string"))
    val v = pmod(docId, lit(6))
    when(v === 0, concat(lit("HTTPS://"), hostUc, lit(":443"), p, lit("?utm_source=x#top")))
      .when(v === 1, concat(lit("https://"), hostLc, p))
      .when(v === 2, concat(lit("https://"), hostLc, lit(":443"), pEnc))
      .when(v === 3, concat(lit("https://"), hostMc, p, lit("?b=2&a=1")))
      .when(v === 4, concat(lit("https://"), hostLc, p, lit("?a=1&utm_campaign=z&b=2")))
      .otherwise(concat(lit("https://"), hostLc, p, lit("#frag")))
  }

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
