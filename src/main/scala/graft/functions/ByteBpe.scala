package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-LEVEL BPE with regex pre-tokenization — the production tokenizer
  * shape (GPT-2 / tiktoken): text splits by the pre-token regex, each
  * pre-token's UTF-8 BYTES map through the standard byte→printable-char
  * table (the GPT-2 `bytes_to_unicode` construction), and the greedy merge
  * loop runs over the mapped single-char base alphabet. Unlike the
  * word-level [[BpeVocab]] (whitespace is a hard token boundary that never
  * reaches the vocabulary), byte-level BPE sees EVERY byte — leading
  * spaces attach to words (`Ġthe`-style tokens), whitespace runs tokenize,
  * and arbitrary binary-ish input cannot fall outside the alphabet. The
  * merge machinery itself is unchanged ([[GreedyBpe]]): only the
  * pre-tokenizer and the base alphabet are new.
  *
  * Token-id scheme — the GPT-2 convention: base byte b → id b (0..255),
  * merge at rank r → id 256 + r. Unlike the word-level scheme no Unicode
  * offset is needed: the mapped alphabet is a bijection with the byte
  * values, and merge outputs are unique in a trained table.
  *
  * Pre-token regex: the GPT-2 pattern re-expressed in the Java∩RE2 common
  * subset so the DuckDB oracle replays pre-tokenization EXACTLY —
  * contractions first, then optional-leading-space letter runs, digit
  * runs, punctuation runs, whitespace runs. Two documented deviations
  * from the original: ASCII classes instead of `\p{L}`/`\p{N}` (the
  * corpus is ASCII; RE2 and Java agree on these byte-for-byte), and no
  * `\s+(?!\S)` branch — RE2 has NO lookahead, so a multi-space run stays
  * one whitespace token instead of donating its last space to the next
  * word. Both engines use leftmost-first alternation with greedy
  * quantifiers, so match streams are identical.
  */
object ByteBpeVocab {

  /** The cross-engine pre-token regex (see class doc for the two
    * deviations from GPT-2's original). Whitespace is the EXPLICIT class
    * `[ \t\n\x0b\f\r]` rather than `\s`: Java's `\s` includes vertical
    * tab, RE2's does not — spelling it out is the only way the two
    * engines match byte-for-byte on every input. */
  private val Ws = " \\t\\n\\x0b\\f\\r"
  val PreTokenRe: String =
    s"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9$Ws]+|[$Ws]+"

  /** GPT-2 `bytes_to_unicode`: printable bytes (33..126, 161..172,
    * 174..255) map to themselves; the rest (controls, space, DEL, 127..160
    * gap, 173) map to 256+n in ascending byte order — a bijection
    * byte ↔ char that keeps every mapped string printable and
    * delimiter-safe (no mapped char is ever whitespace or a control). */
  val ByteToChar: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** Inverse mapping (mapped char → byte value 0..255). */
  val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Trained byte-level merges in rank order (rank = index): 48 merges
    * produced by the classic algorithm (most-frequent adjacent pair, ties
    * to the smallest pair in UTF-8 order) on the sf0.01 `documents`
    * byte-level pre-token histogram — the byte-level twin of
    * [[BpeVocab.Merges]]. `Ġ` (U+0120) is the mapped space byte: the table
    * learns space-prefixed word merges exactly like a real GPT-2 vocab. */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("Ġ", "s"), ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("Ġ", "c"), ("a", "s"),
    ("Ġ", "b"), ("Ġ", "v"), ("a", "r"), ("p", "ar"),
    ("Ġ", "f"), ("Ġ", "a"), ("Ġ", "t"), ("j", "o"),
    ("jo", "in"), ("as", "h"), ("h", "ash"), ("Ġ", "join"),
    ("s", "t"), ("r", "ow"), ("at", "c"), ("atc", "h"), ("a", "n"),
    ("c", "an"), ("lu", "m"), ("lum", "n"), ("o", "lumn"), ("o", "mer"),
    ("st", "omer"), ("u", "stomer"), ("i", "l"), ("il", "t"),
    ("ilt", "er"), ("Ġ", "hash"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("Ġ", "row"), ("Ġs", "can"), ("g", "e"),
    ("l", "ow"), ("mer", "ge"), ("Ġ", "d"), ("Ġs", "mall"))

  private val rank: Map[(String, String), Int] = Merges.zipWithIndex.toMap

  /** Merge outputs → 256 + rank (the GPT-2 id convention). */
  val IdMap: Map[String, Long] = Merges.zipWithIndex.map {
    case ((a, b), i) => (a + b) -> (256L + i)
  }.toMap

  /** Map a raw pre-token's UTF-8 bytes through [[ByteToChar]]. */
  def mapBytes(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteToChar(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Greedy BPE over the mapped single-char symbols of one pre-token. */
  def tokenizeMapped(mapped: String): Array[String] =
    GreedyBpe.run(mapped.toCharArray.map(_.toString), rank, Merges)

  /** Token → id: single mapped char = its byte value, merge output =
    * 256 + rank (every multi-char token IS a merge output in a trained
    * table, and every base symbol is exactly one mapped char). */
  def tokenId(tok: String): Long =
    if (tok.length == 1) CharToByte(tok.charAt(0)).toLong else IdMap(tok)

  /** Full pipeline for one raw pre-token: map bytes, merge, id. */
  def idsOfWord(w: String): Array[Long] =
    tokenizeMapped(mapBytes(w)).map(tokenId)

  /** The merge table as a DuckDB VALUES list `(rank, lhs, rhs)` — oracle
    * for the byte-level trainer. Mapped chars ≥ 256 embed as UTF-8
    * literals (JSON/DuckDB both carry them exactly). */
  private def q(s: String): String = s.replace("'", "''")

  def mergeValuesSql: String = Merges.zipWithIndex.map {
    case ((a, b), i) => s"($i, '${q(a)}', '${q(b)}')"
  }.mkString(",\n    ")

  /** The merged-token ids as a DuckDB VALUES list `(tok, tid)`. */
  def idValuesSql: String = Merges.zipWithIndex.map {
    case ((a, b), i) => s"('${q(a + b)}', ${256 + i})"
  }.mkString(",\n    ")
}

/** `graft_byte_bpe_ids(text)` → array<bigint>: byte-level BPE token ids of
  * the whole document — pre-tokenize ([[ByteBpeVocab.PreTokenRe]]), map
  * each pre-token's UTF-8 bytes to the printable alphabet, run the greedy
  * merge loop, emit GPT-2-convention ids. One compiled pass per row with a
  * per-instance pre-token memo (same caching shape as [[GraftBpeTokens]]:
  * real corpora repeat words constantly, so the merge loop runs once per
  * distinct pre-token per task). */
case class GraftByteBpeIds(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_bpe_ids requires STRING, got ${t.sql}")
  }

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(ByteBpeVocab.PreTokenRe)
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[Long]]()

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val m = pattern.matcher(s)
    while (m.find()) {
      val w = m.group()
      var ids = memo.get(w)
      if (ids == null) { ids = ByteBpeVocab.idsOfWord(w); memo.put(w, ids) }
      var k = 0
      while (k < ids.length) { out += ids(k); k += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftByteBpeIds =
    copy(child = newChild)
  override def prettyName: String = "graft_byte_bpe_ids"
}

/** `graft_byte_map_syms(word)` → array<string>: the mapped single-char
  * base symbols of one raw pre-token — the byte-level trainer's histogram
  * input ([[graft.ops.BpeTrainer.byteHistogram]]), mirroring the word
  * trainer's `regexp_extract_all(w, '(?s).')` codepoint split but through
  * the byte→char alphabet. */
case class GraftByteMapSyms(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_map_syms requires STRING, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val mapped = ByteBpeVocab.mapBytes(input.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](mapped.length)
    var i = 0
    while (i < mapped.length) {
      out(i) = UTF8String.fromString(String.valueOf(mapped.charAt(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftByteMapSyms =
    copy(child = newChild)
  override def prettyName: String = "graft_byte_map_syms"
}
