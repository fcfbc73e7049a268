package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two `array<double>` columns.
  *
  * Why a custom Expression: the portable formulation
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) is numerically identical but runs
  * INTERPRETED — Spark's higher-order functions are excluded from whole-stage
  * codegen, and inside an all-pairs similarity join that's the entire query
  * cost. This expression generates a tight primitive loop instead (~100×),
  * while keeping the exact same left-to-right double accumulation order, so
  * results stay bit-for-bit equal to the fold and to the DuckDB oracle's
  * `list_reduce`.
  *
  * Null handling MATCHES the fold it replaces exactly: a NULL array yields
  * NULL (BinaryExpression default); a length mismatch or a NULL *element*
  * also yields NULL, because `zip_with` pads the shorter array with nulls
  * and SQL `+` propagates them through the aggregate. Embeddings are dense
  * so neither fires in practice, but the equivalence must hold on any
  * input — and when both array types carry `containsNull = false` the
  * generated loop drops the per-element null checks entirely (the hot
  * ANN-scan shape).
  */
case class DotProductDouble(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // length mismatch / null element → null regardless of input nullability
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val body =
        if (elementsNullable)
          s"""
             |boolean $bad = false;
             |for (int $i = 0; $i < $n && !$bad; $i++) {
             |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; }
             |  else { $s += $x.getDouble($i) * $y.getDouble($i); }
             |}
             |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
           """.stripMargin
        else
          s"""
             |for (int $i = 0; $i < $n; $i++) {
             |  $s += $x.getDouble($i) * $y.getDouble($i);
             |}
             |${ev.value} = $s;
           """.stripMargin
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |$body
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Native codegen'd INTEGER dot product of two `array<int>` columns, LONG
  * accumulation — the quantized-ANN scoring kernel. Same rationale as
  * [[DotProductDouble]]: the portable
  * `aggregate(zip_with(q, c, (a, b) -> a::long * b), 0, +)` is interpreted
  * AND allocates an intermediate 64-element array per scored pair — inside
  * the corpus×queries scan that allocation was the measured wall
  * (ann_quantized ran 18× at 10× data from GC pressure alone). Exact
  * integer math, so the result is identical to the fold and to the
  * oracle's `list_reduce`. */
case class DotProductInt(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  // fold-exact null semantics, same contract as [[DotProductDouble]]
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_idot requires (array<int>, array<int>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val body =
        if (elementsNullable)
          s"""
             |boolean $bad = false;
             |for (int $i = 0; $i < $n && !$bad; $i++) {
             |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; }
             |  else { $s += (long) $x.getInt($i) * $y.getInt($i); }
             |}
             |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
           """.stripMargin
        else
          s"""
             |for (int $i = 0; $i < $n; $i++) {
             |  $s += (long) $x.getInt($i) * $y.getInt($i);
             |}
             |${ev.value} = $s;
           """.stripMargin
      s"""
         |int $n = $x.numElements();
         |long $s = 0L;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |$body
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_idot"
}
