package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenization — the SECOND production
  * tokenizer family (T5/Llama ecosystem; Kudo 2018's published algorithm),
  * r15 verdict gap #4. The repo's BPE faces segment by trained MERGES;
  * unigram segments by VITERBI over a trained PIECE table: the
  * segmentation of a word is the piece sequence minimizing total cost
  * (cost = quantized −log p of the piece under the unigram LM).
  *
  * The piece table is the pinned trained artifact (the [[BpeVocab.Merges]]
  * stance): multi-char pieces are the corpus's frequent fragments, every
  * single letter is a fallback piece (SentencePiece keeps all base
  * characters so segmentation never fails), and costs are INTEGER
  * "millinats" — the fixed-point quantization production decoders use
  * (OpenFst-style integer weights) — precisely so the DP replays
  * bit-exactly in any engine: the DuckDB oracle folds the same integer DP
  * with the same (cost, longest-piece) tie-break and must reproduce every
  * segmentation, count and cost. */
object UnigramVocab {

  /** (piece, cost). Costs shaped like quantized −1000·ln p: multi-char
    * pieces at 2000 + 500/char (frequent fragments are cheap per char),
    * single-letter fallbacks at 6500 (rare standalone letters) — a word
    * segments into the longest trained fragments available, and every
    * comparison is an integer one. */
  val Pieces: IndexedSeq[(String, Int)] = {
    val multi = IndexedSeq(
      "er", "in", "ow", "or", "st", "ar", "an", "at", "al", "le", "ue",
      "row", "key", "agg", "big", "the", "part", "fast", "slow", "scan",
      "hash", "join", "sort", "line", "data", "query", "batch", "small",
      "merge", "table", "value", "order", "group", "spark", "column",
      "filter", "stream", "window", "vector", "customer")
      .map(p => p -> (2000 + 500 * p.length))
    val singles = ('a' to 'z').map(c => c.toString -> 6500)
    multi ++ singles
  }

  val MaxPieceLen: Int = Pieces.map(_._1.length).max

  private val costOf: Map[String, Int] = Pieces.toMap

  /** Minimal total cost of segmenting `word` (forward DP). dp(i) = cost
    * of the length-i prefix; single-letter fallbacks make every [a-z]
    * word segmentable. */
  def viterbiCosts(word: String): Array[Long] = {
    val n = word.length
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var l = 1
      val lMax = math.min(i, MaxPieceLen)
      while (l <= lMax) {
        costOf.get(word.substring(i - l, i)) match {
          case Some(c) if dp(i - l) != Long.MaxValue =>
            val t = dp(i - l) + c
            if (t < best) best = t
          case _ =>
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    dp
  }

  /** Viterbi segmentation: forward DP + backward greedy reconstruction —
    * at each end position take the piece achieving dp equality with the
    * LONGEST length (pieces are unique strings, so (cost, length) totally
    * orders the candidates). */
  def segmentWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val dp = viterbiCosts(word)
    require(dp(word.length) != Long.MaxValue,
      s"unigram: unsegmentable word '$word' (non-[a-z] input?)")
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = word.length
    while (i > 0) {
      var chosen: String = null
      var l = math.min(i, MaxPieceLen)
      // longest-first: the FIRST length achieving the optimum wins
      var found = false
      while (l >= 1 && !found) {
        val p = word.substring(i - l, i)
        costOf.get(p) match {
          case Some(c) if dp(i - l) != Long.MaxValue && dp(i - l) + c == dp(i) =>
            chosen = p; found = true
          case _ =>
        }
        l -= 1
      }
      require(found, s"unigram: backtrace failed in '$word' at $i")
      out += chosen
      i -= chosen.length
    }
    out.reverseIterator.toArray
  }

  /** Total cost of the optimal segmentation. */
  def wordCost(word: String): Long = viterbiCosts(word)(word.length)
}

/** `graft_unigram_tokens(text)` → array<string>: lowercase-[a-z]+ word
  * extraction (the `TextOps.tokens` stream), then Viterbi segmentation of
  * each word over [[UnigramVocab.Pieces]]. One compiled pass per row with
  * the per-task distinct-word memo every real tokenizer keeps (the
  * [[GraftBpeTokens]] shape). */
case class GraftUnigramTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_tokens requires STRING, got ${t.sql}")
  }

  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val n = s.length
    var i = 0
    var runStart = -1
    def flush(end: Int): Unit = {
      if (runStart >= 0) {
        val word = s.substring(runStart, end)
        var toks = memo.get(word)
        if (toks == null) {
          toks = UnigramVocab.segmentWord(word); memo.put(word, toks)
        }
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
        runStart = -1
      }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') { if (runStart < 0) runStart = i }
      else flush(i)
      i += 1
    }
    flush(n)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftUnigramTokens =
    copy(child = newChild)
  override def prettyName: String = "graft_unigram_tokens"
}
