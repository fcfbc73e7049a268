package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bloom-filter membership probe as a NATIVE codegen'd expression:
  * `graft_bloom_contains(bits, key, numBits, numHashes)` tests the
  * `numHashes` double-hashed positions of `key` against a bit array packed
  * as `array<bigint>` (built by `graft.ops.BloomOps.BloomAggregator` with
  * the IDENTICAL hash family — the shared static helpers below are the
  * single source of that arithmetic).
  *
  * This is the map-side row-pruning primitive of the Bloom semi-join
  * (ops/BloomOps.scala): it must sit in the fact scan's hot path, so it is
  * a real `doGenCode` expression (stays inside WholeStageCodegen), not a
  * UDF and not CodegenFallback. Hash family: splitmix64 double hashing
  * (Kirsch–Mitzenmacher `h1 + i·h2` — public constants, standard
  * construction), so probes are deterministic across runs and engines.
  * NULL keys yield NULL (dropped by a filter), matching semi-join
  * semantics where NULL never matches. */
case class GraftBloomContains(left: Expression, right: Expression,
                              numBits: Int, numHashes: Int)
    extends BinaryExpression {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (ARRAY<BIGINT>, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(bits: Any, key: Any): Any =
    GraftBloomContains.mightContain(
      bits.asInstanceOf[ArrayData], key.asInstanceOf[Long], numBits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.GraftBloomContains.mightContain($b, $k, $numBits, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftBloomContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}

object GraftBloomContains {

  /** splitmix64 finalizer (Steele/Lea/Flood constants — public knowledge). */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set `key`'s probe bits in a packed bit array (build side; the probe
    * below reads the same positions — keep the two in lockstep). */
  def setBits(bits: Array[Long], key: Long, numBits: Int, numHashes: Int): Unit = {
    val h1 = splitmix64(key)
    val h2 = splitmix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      bits(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe (also the codegen target — must stay a static call). */
  def mightContain(bits: ArrayData, key: Long, numBits: Int, numHashes: Int): Boolean = {
    val h1 = splitmix64(key)
    val h2 = splitmix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((bits.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
