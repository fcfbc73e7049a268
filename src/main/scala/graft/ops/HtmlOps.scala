package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction — the curation stage that precedes every
  * text operator in a real pipeline (the CCNet / trafilatura stage): a
  * 100 TB crawl arrives as markup, not clean text. The classic rule stack,
  * re-expressed as pure codegen-friendly string/array ops (no UDFs, no
  * parser state — every step is a regex or a higher-order fold, so the
  * whole stage runs map-side at any scale, shuffles nothing, and the
  * DuckDB oracle replays it operator for operator):
  *
  *   1. DROP non-content subtrees: `<script>` / `<style>` blocks and
  *      comments are removed BEFORE any tag handling (a `<` inside script
  *      text would otherwise be eaten as a tag — the fixture plants one).
  *   2. SEGMENT into block elements (`p`, `div`, `li`, `h1`, `footer`)
  *      with ONE alternation regex, so document order is preserved
  *      without backreferences (RE2 has none — each branch closes its own
  *      literal tag).
  *   3. LINK-DENSITY CULL (the boilerplate rule): a block whose anchor
  *      text is more than 1/3 of its text is navigation/footer chrome.
  *      The comparison is exact-integer (`3·len(linktext) ≤ len(text)`),
  *      so both engines decide identically — no float thresholds.
  *   4. STRIP remaining tags, DECODE the common entities (`&amp;` LAST,
  *      so `&amp;lt;` does not double-decode), COLLAPSE whitespace.
  *
  * Every regex is in the Java∩RE2 common subset (classes, alternation,
  * lazy quantifiers, `(?s)` — no lookaround, no backreferences).
  */
object HtmlOps {

  /** Script/style subtrees and comments — removed before tag stripping. */
  val StripRe: String =
    "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"

  /** Block-level segments, one alternation so matches come back in
    * document order; nesting of SAME-NAME blocks is out of scope (lazy
    * match stops at the first close tag), like every regex-level
    * extractor. */
  val BlockRe: String =
    "(?s)<p[^>]*>.*?</p>|<div[^>]*>.*?</div>|<li[^>]*>.*?</li>" +
      "|<h1[^>]*>.*?</h1>|<footer[^>]*>.*?</footer>"

  /** Anchor subtrees (for the link-density numerator). */
  val LinkRe: String = "(?s)<a[^>]*>.*?</a>"

  /** Any remaining tag. */
  val TagRe: String = "<[^>]*>"

  /** Whitespace runs, as an EXPLICIT class shared with the oracle: Java's
    * `\s` includes vertical tab, RE2's does not — spelled out, the two
    * engines agree on every input. */
  val WsRe: String = "[ \\t\\n\\x0b\\f\\r]+"

  /** Link-density keep rule: text non-empty and anchor text ≤ 1/3 of it. */
  val DensityNum = 3

  private def stripTags(c: Column): Column =
    regexp_replace(c, TagRe, "")

  /** Concatenated anchor TEXT of one block (tags stripped). */
  private def linkText(b: Column): Column =
    aggregate(
      transform(regexp_extract_all(b, lit(LinkRe), lit(0)), a => stripTags(a)),
      lit(""), (acc, x) => concat(acc, x))

  /** (n_blocks, n_kept, extracted) from a materialized html column. The
    * caller gives `html` its own select (the usual HOF-no-CSE rule); all
    * three outputs derive from one `blocks` array. Pass the RESULT of
    * [[blocks]] — see the query for the staging. */
  def blocks(html: Column): Column =
    regexp_extract_all(regexp_replace(html, StripRe, ""), lit(BlockRe), lit(0))

  /** Kept block texts (tag-stripped), in document order. Staged through a
    * (txt, link_len) struct so the tag-strip regex runs ONCE per block —
    * Catalyst has no CSE inside HOF lambdas (the shingleSets rule), and a
    * naive filter-then-transform re-strips every block three times. */
  def keptTexts(blocksCol: Column): Column = {
    val scored = transform(blocksCol, b =>
      struct(stripTags(b).as("txt"), length(linkText(b)).as("ll")))
    transform(
      filter(scored, s =>
        length(s.getField("txt")) > 0 &&
          s.getField("ll") * DensityNum <= length(s.getField("txt"))),
      s => s.getField("txt"))
  }

  /** Join kept texts with single spaces, decode entities (`&amp;` last),
    * collapse whitespace runs, trim. */
  def joinAndClean(texts: Column): Column = {
    val joined = aggregate(texts, lit(""),
      (acc, x) => when(acc === "", x).otherwise(concat(acc, lit(" "), x)))
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(joined) { case (c, (e, r)) =>
        call_function("replace", c, lit(e), lit(r))
      }
    trim(regexp_replace(decoded, WsRe, " "))
  }

  /** Deterministic markup fixture: wraps a document's text in generated
    * boilerplate — head with style/script traps (a `<` INSIDE script
    * text), a nav div and a footer at link density 1, a link-heavy `<li>`
    * (density > 1/3, must drop), the content `<p>` with one inline anchor
    * (density ≪ 1/3, must keep), a short entity-bearing `<p>`, and an
    * HTML comment. What no 100 TB crawl looks like: clean text — this is
    * the markup every real document arrives wrapped in. */
  def htmlFixture(docId: Column, text: Column): Column = {
    val id = docId.cast("string")
    concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><style>body { color: #fff; }</style>" +
        "<script>var x = 1 < 2; track("), id,
      lit(");</script></head><body>" +
        "<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
        " <a href=\"/contact\">Contact</a></div>" +
        "<p>"), text,
      lit(" <a href=\"/ref\">ref</a></p>" +
        "<li><a href=\"/x\">more links</a> <a href=\"/y\">other pages</a></li>" +
        "<p>short &amp; sweet "), pmod(docId, lit(7)).cast("string"),
      lit("</p><!-- generated page "), id,
      lit(" --><footer><a href=\"/tos\">Terms</a> | " +
        "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
  }
}
