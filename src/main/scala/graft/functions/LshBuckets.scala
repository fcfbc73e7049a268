package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ALL hyperplane-LSH bucket ids of a vector in ONE primitive pass:
  * element t of the result is table t's `bits`-bit sign bucket, bit j set
  * iff the strict left-fold dot of the vector with plane (t, j) is > 0 —
  * bit-identical to the declarative `lshBucket` sum of
  * `when(graft_dot(v, lit(plane)) > 0, 1L << j)` it replaces.
  *
  * Why a custom Expression: the declarative form instantiates tables×bits
  * SEPARATE dot-product expressions, each re-reading the vector column
  * through its own generated loop — at the tight parameterization (12×18)
  * that is 216 expression evaluations per row and was measured as 2/3 of
  * the whole pair-query wall at sf1 (21 s of 32). Here the planes ride
  * along as one reference object (the same [[SimilarityOps.planes]]
  * values — deterministic, derived from (table, bit, dim)), and the
  * triple loop is primitive code that reads each vector element once per
  * plane with no per-dot expression overhead. */
case class LshBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires array<double>, got ${t.sql}")
  }

  // planes(t)(j) — rebuilt deterministically on every executor
  @transient private lazy val packed: Array[Array[Array[Double]]] =
    Array.tabulate(tables)(t =>
      graft.ops.SimilarityOps.planes(t, bits, dim).map(_.clone()).toArray)

  override def nullSafeEval(v: Any): Any =
    LshBuckets.buckets(v.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", packed, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshBuckets.buckets($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_buckets"
}

object LshBuckets {
  /** Shared by interpreted and generated paths. Left-to-right double adds
    * keep bucket values bit-identical to the `graft_dot`-per-plane
    * formulation on the dense, equal-length vectors this is registered
    * over. The defensive min-length/null-skip handling here is local
    * (planes are internal constants, so neither case can fire) — unlike
    * [[DotProductDouble]], which now propagates NULL to match the SQL
    * fold. */
  def buckets(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      val tp = planes(t)
      var b = 0L
      var j = 0
      while (j < tp.length) {
        val p = tp(j)
        val n = math.min(v.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) s += v.getDouble(i) * p(i)
          i += 1
        }
        if (s > 0) b |= 1L << j
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}
