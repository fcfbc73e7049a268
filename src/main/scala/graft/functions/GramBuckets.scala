package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-3-gram bucket HISTOGRAM of a string, in one compiled pass —
  * the feature extractor of the trained language-ID face
  * (`graft.ops.LangIdOps`).
  *
  * Equivalent Column formulation (and the DuckDB oracle's replay):
  * `regexp_replace(lower(text), "[^a-z ]", "")` → per-char codes →
  * `h = pmod(pmod(pmod(c1·B1 + c2, P)·B1 + c3, P), buckets)` per 3-char
  * window → one `size(filter(grams, = k))` per bucket. That phrasing
  * evaluates `buckets` interpreted higher-order filters per row (HOFs are
  * CodegenFallback and Catalyst inlines every use), i.e. buckets × grams
  * lambda calls — measured 78 ms/doc at 64 buckets. This expression
  * produces the identical counts in a single char scan.
  *
  * Exactness contract: lowercasing via `String.toLowerCase` — the
  * GraftTextCounts precedent for `lower(text)` agreement: Spark's own
  * `UTF8String.toLowerCase` takes the default-locale `String.toLowerCase`
  * path for non-ASCII input, so pinning `Locale.ROOT` here would diverge
  * from the `lower()` reference formulation; like every lower()-comparing
  * face, this assumes the harness JVM runs under an English/POSIX locale
  * (a Turkish-locale JVM changes `lower()` itself). The `[a-z ]`
  * keep-filter applied per UTF-16 unit equals the per-codepoint
  * `regexp_replace` because every unit of a multi-unit codepoint is
  * outside `[a-z ]`. Hash arithmetic is exact int64: codes ≤ 122, so
  * `h1·B1 + c ≤ (P−1)·131 + 122 < 2^38`. All values nonnegative, so `%`
  * equals `pmod`.
  *
  * Returns `array<long>` of length `buckets` (all zeros when fewer than 3
  * kept chars — the `size(codes) < 3 → empty grams` branch). */
case class GraftGramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if buckets > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_buckets requires buckets > 0, got $buckets")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_buckets requires STRING, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val low = input.asInstanceOf[UTF8String].toString.toLowerCase
    val P = graft.ops.TextOps.P
    val B1 = graft.ops.TextOps.B1
    val counts = new Array[Long](buckets)
    // rolling 3-char window over the kept chars (no materialized code array)
    var c1 = -1L; var c2 = -1L
    var kept = 0
    var i = 0
    val n = low.length
    while (i < n) {
      val ch = low.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || ch == ' ') {
        val c3 = ch.toLong
        kept += 1
        if (kept >= 3) {
          val h1 = (c1 * B1 + c2) % P
          val h = ((h1 * B1 + c3) % P) % buckets
          counts(h.toInt) += 1
        }
        c1 = c2; c2 = c3
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftGramBuckets =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_buckets"
}
