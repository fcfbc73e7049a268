package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrubbing stage every training-data
  * pipeline runs before text ships (emails, phone numbers, IP addresses
  * replaced by typed placeholders). Pure per-row regex compute: runs
  * map-side inside whole-stage codegen at any scale, no state, no
  * shuffle. The patterns are written in the Java∩RE2 regex subset (ASCII
  * classes, bounded repetition, word boundaries — no lookaround, no
  * backrefs) so the DuckDB oracle replays them CHARACTER-IDENTICALLY;
  * the redaction ORDER (email → phone → IP) is normative, placeholders
  * contain no digits so later passes can never re-match inside one.
  *
  * The fixture plants PII deterministically from doc_id (replayable
  * arithmetic in both engines) plus a BOUNDARY TRAP: a dotted version
  * string `v1.2.3.4000` whose 4-digit tail must keep the IP pattern's
  * trailing `\b` from matching — an engine pair that disagrees on word
  * boundaries breaks the value gate, not just a unit test. */
object PiiOps {

  /** RFC-5322-ish practical email shape. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dialable number (the fixture's planted shape). */
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4, word-bounded on both ends. */
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Deterministic PII wrap of a document (doc_id-derived addresses so
    * the oracle replays the construction): always one email + one IPv4;
    * a second email iff id % 3 = 0; a phone unless id % 4 = 0; the
    * version-string boundary trap iff id % 6 = 0. */
  def piiFixture(docId: Column, text: Column): Column = {
    val id = docId.cast("string")
    def m(k: Int, base: Int, mul: Int = 1): Column =
      (pmod(docId * mul, lit(k)) + base).cast("string")
    concat(
      text,
      lit(" Contact user"), id, lit("@mail"), m(7, 0),
      lit(".example.org"),
      when(pmod(docId, lit(3)) === 0,
        concat(lit(" and admin"), id, lit("@example.com")))
        .otherwise(lit("")),
      when(pmod(docId, lit(4)) === 0, lit(""))
        .otherwise(concat(lit(" or call +1-"), m(700, 200), lit("-"),
          m(900, 100), lit("-"), m(9000, 1000))),
      lit(" from "), m(223, 1), lit("."), m(256, 0, 7), lit("."),
      m(256, 0, 13), lit("."), m(256, 0, 31),
      when(pmod(docId, lit(6)) === 0, lit(" v1.2.3.4000 released"))
        .otherwise(lit("")),
      lit(" end"))
  }

  /** Per-category match count (the audit metric a pipeline owner tracks
    * per corpus snapshot). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redact in the normative order. Placeholders are digit-free, so no
    * pass can create a match for a later one. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")
}
