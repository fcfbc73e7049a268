package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-pair-encoding tokenizer: the standard greedy merge algorithm
  * (Sennrich et al. 2016; the GPT-2 tokenizer's shape) over a TRAINED,
  * embedded merge table — replacing the former "BPE-ish" pre-token count
  * heuristic, whose numbers no real pipeline would ship (every
  * token-denominated operator downstream — packing bins, chunk spans,
  * mixture rates — inherits these counts).
  *
  * Algorithm (per pre-token): start from single characters; repeatedly
  * find the adjacent symbol pair with the LOWEST merge rank and merge all
  * its left-to-right non-overlapping occurrences; stop when no adjacent
  * pair is in the table. For a WELL-FORMED merge table (every merge's
  * parts are base characters or outputs of strictly lower-ranked merges —
  * which any table produced by BPE training is, since a symbol cannot be
  * merged before it exists), this is provably equivalent to sweeping the
  * merges once in rank order applying each to fixpoint — the form the
  * DuckDB oracle replays with delimited-string `replace()` in a recursive
  * CTE, validated against this implementation on every corpus word plus
  * overlap/repeat stress cases.
  *
  * The embedded table is 48 merges trained by the classic algorithm
  * (most-frequent adjacent pair, ties to the lexicographically smallest)
  * on the sf0.01 `documents` word-frequency distribution — small enough
  * to bake into both engines as literals, real enough that corpus words
  * tokenize to genuine subwords (avg ≈ 2.3 tokens/word). */
object BpeVocab {

  /** Trained merges in rank order (rank = index). */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"), ("v", "ector"))

  private val rank: Map[(String, String), Int] =
    Merges.zipWithIndex.toMap

  /** Token-id scheme (single source — the queries and their oracles must
    * agree): single-codepoint tokens map to their codepoint, merged tokens
    * to `MergedIdBase + rank`. 0x110000 is one past the last Unicode
    * codepoint, so the two id spaces cannot collide; merge outputs are
    * unique in a trained table (each merge creates a NEW symbol). */
  val MergedIdBase: Long = 0x110000L

  /** token → id for every merged token. */
  val IdMap: Map[String, Long] = Merges.zipWithIndex.map {
    case ((a, b), i) => (a + b) -> (MergedIdBase + i)
  }.toMap

  /** The merged-token ids as a DuckDB VALUES list `(tok, tid)`. */
  def idValuesSql: String = Merges.zipWithIndex.map {
    case ((a, b), i) => s"('$a$b', ${MergedIdBase + i})"
  }.mkString(",\n    ")

  /** The merge table as a DuckDB VALUES list `(rank, lhs, rhs)` — the
    * oracle for the DISTRIBUTED trainer ([[graft.ops.BpeTrainer]]): this
    * table IS the classic algorithm's output on the sf0.01 corpus, so a
    * Spark training run over the same documents must reproduce it
    * rank-for-rank. */
  def mergeValuesSql: String = Merges.zipWithIndex.map {
    case ((a, b), i) => s"($i, '$a', '$b')"
  }.mkString(",\n    ")

  /** Greedy BPE of one pre-token: lowest-rank applicable pair first, all
    * left-to-right occurrences per round. Pure function of the word. */
  def tokenizeWord(w: String): Array[String] = {
    if (w.isEmpty) return Array.empty
    // split by CODE POINT (regex engines and DuckDB string_split('') both
    // treat a supplementary-plane char as one unit)
    val sym: Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    GreedyBpe.run(sym, rank, Merges)
  }
}

/** The greedy lowest-rank-first merge loop, shared by the word-level
  * ([[BpeVocab]]) and byte-level ([[ByteBpeVocab]]) tokenizers — the
  * algorithm is table-agnostic; only the base alphabet and the trained
  * table differ. */
private[graft] object GreedyBpe {
  def run(sym0: Array[String], rank: scala.collection.Map[(String, String), Int],
          merges: IndexedSeq[(String, String)]): Array[String] = {
    var sym = sym0
    var done = false
    while (!done && sym.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < sym.length - 1) {
        val r = rank.getOrElse((sym(i), sym(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val merged = a + b
        val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
        var j = 0
        while (j < sym.length) {
          if (j + 1 < sym.length && sym(j) == a && sym(j + 1) == b) {
            out += merged; j += 2
          } else { out += sym(j); j += 1 }
        }
        sym = out.toArray
      }
    }
    sym
  }
}

/** `graft_bpe_tokens(text)` → array<string>: pre-tokenize with the same
  * scan as [[GraftTextCounts]]'s `n_bpe` class boundaries (letter runs,
  * digit runs, each other non-whitespace codepoint — the GPT-style
  * pre-split), then run REAL greedy BPE ([[BpeVocab.tokenizeWord]]) on
  * each pre-token. One compiled pass per row with a per-expression-
  * instance word memo — real corpora repeat words constantly (the
  * distinct-word set is orders of magnitude smaller than the token
  * stream), so the merge loop runs once per distinct word per task, the
  * same caching shape every real BPE implementation uses. */
case class GraftBpeTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens requires STRING, got ${t.sql}")
  }

  // per-instance memo (expression instances are per-task after
  // serialization, so no cross-task contention); bounded only by the
  // distinct-word set of the partition, which is the working set any BPE
  // cache holds
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val n = s.length
    var i = 0
    var runStart = -1
    var runCls = 0 // 1 = letter, 2 = digit
    def flush(end: Int): Unit = {
      if (runStart >= 0) {
        val word = s.substring(runStart, end)
        var toks = memo.get(word)
        if (toks == null) { toks = BpeVocab.tokenizeWord(word); memo.put(word, toks) }
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
        runStart = -1
      }
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val cw = Character.charCount(cp)
      val c = if (cp > 0xFFFF) '￿' else cp.toChar
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      val cls =
        if (isWs) 0
        else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) 1
        else if (c >= '0' && c <= '9') 2
        else 3
      cls match {
        case 1 | 2 =>
          if (runStart < 0 || runCls != cls) { flush(i); runStart = i; runCls = cls }
        case 3 =>
          flush(i)
          // each other-char is its own pre-token (single symbol: BPE of a
          // 1-symbol word is itself — no merge can apply)
          out += UTF8String.fromString(s.substring(i, i + cw))
        case _ => flush(i)
      }
      i += cw
    }
    flush(n)
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): GraftBpeTokens =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_tokens"
}
