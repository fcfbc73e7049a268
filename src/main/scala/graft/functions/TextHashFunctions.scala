package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.ops.TextOps.{B2, P}

/** Native signature expressions for the dedup pipeline.
  *
  * Why native: the portable higher-order formulation
  * (`transform(sequence(0,k-1), i -> array_min(transform(shingles, …)))`)
  * evaluates k×|shingles| interpreted Catalyst expressions per row — ~40k
  * for MinHash(128) over an 80-shingle document, which made signature
  * computation the bench bottleneck. These expressions run the same
  * arithmetic as a tight JVM loop (CodegenFallback: one virtual call per
  * row, the loop itself is compiled Scala).
  *
  * Determinism: pure integer arithmetic — identical results to the
  * higher-order formulation and to the DuckDB oracle SQL (`GraftSimHash`
  * values are oracle-compared in text_fingerprint/dedup_simhash;
  * `GraftMinHash` only drives LSH candidate generation).
  */
/** Polynomial hash of every token: `h = (h*B1 + code) % P` folded over the
  * characters of each token. Tokens come from the `[a-z]+` extractor, so
  * every character is ASCII and the byte-wise fold here is bit-identical to
  * the portable `aggregate(split(s,''), 0, (h,c) -> (h*B1+ascii(c))%P)`
  * formulation and to the DuckDB oracle's `list_reduce` — while running as
  * one compiled loop per row instead of |token|×|chars| interpreted evals. */
case class GraftWordHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import graft.ops.TextOps.B1
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_hashes requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var j = 0
      while (j < bytes.length) { h = (h * B1 + (bytes(j) & 0xffL)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftWordHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_word_hashes"
}

/** Distinct n-word shingle hashes of a word-hash array: shingle i covers
  * hashes [i, i+n), folded as `h = (h*B2 + wh) % P`; first-occurrence order
  * (same as the portable `array_distinct(transform(sequence…))`
  * formulation). Short docs (< n tokens) yield the empty array. One compiled
  * pass instead of |positions|×n interpreted evals — and, critically, the
  * child word-hash array is evaluated ONCE (a lambda-bound array in the
  * portable form is re-evaluated per position). */
case class GraftShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val whs = input.asInstanceOf[ArrayData]
    val cnt = whs.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < cnt) {
      var h = 0L
      var j = 0
      while (j < n) { h = (h * B2 + whs.getLong(i + j)) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftShingles =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles"
}

/** ALL n-word shingle hashes in POSITIONAL order (the non-distinct sibling
  * of [[GraftShingles]]): element i is the hash of tokens [i, i+n), so a
  * consumer can `posexplode` the array and reason about token offsets —
  * the shape span-level substring dedup needs. Same fold, same arithmetic,
  * same empty-array contract for short docs. */
case class GraftShinglesAll(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles_all requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val whs = input.asInstanceOf[ArrayData]
    val cnt = whs.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 0L
      var j = 0
      while (j < n) { h = (h * B2 + whs.getLong(i + j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftShinglesAll =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles_all"
}

/** ALL n-word shingle hashes in positional order under the PACKED
  * DOUBLE-PRIME 62-bit identity key (TextOps hash-width policy): takes the
  * TOKEN array (not pre-hashed words — both prime streams need the chars),
  * char-folds each token mod P and mod P2 with base B1, word-folds each
  * window mod the matching prime with base B2, and packs `h1 * P2 + h2`.
  * By CRT a packed collision requires polynomial congruence mod
  * P·P2 ≈ 9.98e17, so hash equality is safe to treat as content identity
  * at 100 TB window counts (expected false pairs n²/(2·P·P2) ≈ 0.5 at
  * n = 10⁹ windows, vs ~5·10⁸ in the single-prime space). Every
  * intermediate stays < 2^63, so the DuckDB oracle replays the exact
  * integer math. Short docs (< n tokens) yield the empty array. */
case class GraftShinglesAllWide(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  import graft.ops.TextOps.{B1, P2}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles_all_wide requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val cnt = nt - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val w1 = new Array[Long](nt)
    val w2 = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      val bytes = toks.getUTF8String(i).getBytes
      var h1 = 0L
      var h2 = 0L
      var j = 0
      while (j < bytes.length) {
        val c = bytes(j) & 0xffL
        h1 = (h1 * B1 + c) % P
        h2 = (h2 * B1 + c) % P2
        j += 1
      }
      w1(i) = h1; w2(i) = h2
      i += 1
    }
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var h1 = 0L
      var h2 = 0L
      var j = 0
      while (j < n) {
        h1 = (h1 * B2 + w1(i + j)) % P
        h2 = (h2 * B2 + w2(i + j)) % P2
        j += 1
      }
      out(i) = h1 * P2 + h2
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftShinglesAllWide =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles_all_wide"
}

case class GraftMinHash(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      // a_i/b_i: same LCG-derived constants as TextOps.minHashSignature
      val a = (i.toLong * 1103515245L + 12345L) % (P - 1) + 1L
      val b = (i.toLong * 69069L + 362437L) % P
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = (a * xs.getLong(j) + b) % P
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftMinHash =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

case class GraftSimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      var vote = 0L
      var j = 0
      while (j < n) {
        if (((xs.getLong(j) >> p) & 1L) == 1L) vote += 1 else vote -= 1
        j += 1
      }
      if (vote > 0) sig += (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): GraftSimHash =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}
