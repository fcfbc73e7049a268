package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF coarse-quantizer assignment: ranks the (few) centroids by
  * squared distance to `child` (an `array<double>` vector) and returns the
  * centroid indices in ascending (distance, index) order — element 1 is the
  * nearest list, a `slice` prefix is the multi-probe set.
  *
  * Why a custom Expression: the declarative formulation (an `aggregate` /
  * `array_sort` over `nLists` struct literals each embedding a full centroid
  * array) creates a plan with nLists × dim literal nodes evaluated through
  * interpreted higher-order functions — at sf0.1 that is the entire query
  * cost, and HOFs never enter whole-stage codegen. Here the centroids ride
  * along as one reference object and the distance loop is primitive code.
  *
  * Distance uses the ||c||² − 2·v·c expansion (the ||v||² term is constant
  * per row and cannot change the ranking), accumulated left-to-right in
  * double — identical arithmetic to the previous declarative plan, so probe
  * sets are unchanged.
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<double>, got ${t.sql}")
  }

  @transient private lazy val packed: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.rank(v.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", packed, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCentroids.rank($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {
  /** Shared by interpreted and generated paths: centroid ids sorted by
    * (squared-distance-expansion, id). Insertion sort — nLists is small. */
  def rank(v: ArrayData, centroids: Array[Array[Double]]): ArrayData = {
    val k = centroids.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cc = centroids(c)
      val n = math.min(v.numElements(), cc.length)
      var c2 = 0.0
      var dot = 0.0
      var i = 0
      while (i < cc.length) { c2 += cc(i) * cc(i); i += 1 }
      i = 0
      while (i < n) {
        if (!v.isNullAt(i)) dot += v.getDouble(i) * cc(i)
        i += 1
      }
      d(c) = c2 - 2.0 * dot
      c += 1
    }
    val order = new Array[Int](k)
    c = 0
    while (c < k) { order(c) = c; c += 1 }
    var a = 1
    while (a < k) {
      val id = order(a)
      val dd = d(id)
      var b = a - 1
      while (b >= 0 && (d(order(b)) > dd || (d(order(b)) == dd && order(b) > id))) {
        order(b + 1) = order(b)
        b -= 1
      }
      order(b + 1) = id
      a += 1
    }
    new GenericArrayData(order.map(Integer.valueOf(_).asInstanceOf[Any]))
  }
}
