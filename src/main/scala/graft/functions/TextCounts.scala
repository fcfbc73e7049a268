package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All the per-document token/char counts the text-quality operators need,
  * in ONE compiled pass over the string (vs 6-8 independent
  * `regexp_extract_all`/higher-order-filter subtree evaluations per row
  * when the same quantities are phrased as composable Columns — Catalyst
  * inlines each use of a shared Column expression, and higher-order
  * functions are CodegenFallback, so nothing de-duplicates them).
  *
  * Fields (struct):
  *  - `n_ws`:    maximal runs of non-whitespace — `\S+` token count
  *  - `n_bpe`:   BPE-ish pre-tokens — letter runs + digit runs + each other
  *               non-whitespace char (`[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]`)
  *  - `n_word`:  `[a-z]+` runs of the lowercased text (TextOps.tokens count)
  *  - `n_punct`: chars outside `[A-Za-z0-9\s]` (punctRatio numerator)
  *  - `sw_hits`: per-language stopword hits WITH multiplicity, aligned with
  *               `TextOps.StopwordLists` order (stopwordRatio / langId)
  *
  * Exactness contract: byte-for-byte the same counts as the regex/HOF
  * formulations (and therefore the DuckDB oracles) for any text whose
  * word characters are ASCII — whitespace classes mirror the Java regex
  * `\s` = `[ \t\n\x0B\f\r]`, and the word scan runs over
  * `String.toLowerCase` output exactly like `lower(text)`. (A non-ASCII
  * letter that case-folds INTO `[a-z]` is followed by the same lowered-char
  * scan, so even that edge agrees.) Pass 1 iterates by CODE POINT, matching
  * the per-codepoint semantics of both Java regex and DuckDB/RE2: a
  * supplementary-plane char (emoji etc.) counts once in `n_punct`/`n_bpe`,
  * not once per UTF-16 surrogate half.
  */
case class GraftTextCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = GraftTextCounts.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_text_counts requires STRING, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var nWs = 0L; var nBpe = 0L; var nPunct = 0L
    // pass 1 (original chars): \S+ runs, BPE pre-tokens, punct chars.
    // char classes mirror the Java regex the Column formulation uses.
    // Iterate by CODE POINT, not UTF-16 unit: regex engines (Java and
    // DuckDB/RE2 alike) match `[^a-zA-Z0-9\s]` once per codepoint, so a
    // supplementary-plane char (emoji etc.) must count +1, not +2.
    var i = 0
    var prevWs = true      // start-of-string behaves like whitespace
    var prevCls = 0        // 0 = ws, 1 = letter, 2 = digit, 3 = other
    while (i < n) {
      val cp = s.codePointAt(i)
      // non-BMP codepoints are never ws/letter/digit → classify via a
      // sentinel that lands in 'other'
      val c = if (cp > 0xFFFF) '￿' else cp.toChar
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      val cls =
        if (isWs) 0
        else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) 1
        else if (c >= '0' && c <= '9') 2
        else 3
      if (!isWs && prevWs) nWs += 1
      cls match {
        case 1 => if (prevCls != 1) nBpe += 1
        case 2 => if (prevCls != 2) nBpe += 1
        case 3 => nBpe += 1; nPunct += 1 // every other-char is its own token
        case _ => ()
      }
      prevWs = isWs
      prevCls = cls
      i += Character.charCount(cp)
    }
    // pass 2 (lowered chars): [a-z]+ word tokens + stopword hits
    val low = s.toLowerCase
    val m = low.length
    var nWord = 0L
    val swHits = new Array[Long](GraftTextCounts.NumLangs)
    val tok = new java.lang.StringBuilder(24)
    var j = 0
    while (j <= m) {
      val inWord = j < m && {
        val c = low.charAt(j); c >= 'a' && c <= 'z'
      }
      if (inWord) tok.append(low.charAt(j))
      else if (tok.length > 0) {
        nWord += 1
        val idxs = GraftTextCounts.StopwordIndex.get(tok.toString)
        if (idxs != null) {
          var k = 0
          while (k < idxs.length) { swHits(idxs(k)) += 1; k += 1 }
        }
        tok.setLength(0)
      }
      j += 1
    }
    InternalRow(nWs, nBpe, nWord, nPunct, new GenericArrayData(swHits))
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTextCounts =
    copy(child = newChild)
  override def prettyName: String = "graft_text_counts"
}

object GraftTextCounts {
  val Schema: StructType = StructType(Seq(
    StructField("n_ws", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("n_word", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("sw_hits", ArrayType(LongType, containsNull = false),
      nullable = false)))

  val NumLangs: Int = graft.ops.TextOps.StopwordLists.size

  /** Language index of `lang` in StopwordLists order (sw_hits alignment). */
  def langIndex(lang: String): Int =
    graft.ops.TextOps.StopwordLists.indexWhere(_._1 == lang)

  /** word → indexes of the languages whose stopword list contains it. */
  val StopwordIndex: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    graft.ops.TextOps.StopwordLists.zipWithIndex.foreach { case ((_, ws), li) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }
}
