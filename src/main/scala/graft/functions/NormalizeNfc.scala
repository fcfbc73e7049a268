package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * Catalyst expression — Spark has no builtin normalizer, and a Scala UDF
  * would break whole-stage codegen on the hottest map stage of a curation
  * pipeline. The normalization itself is the JDK's `java.text.Normalizer`
  * (ICU-derived, platform-public); DuckDB's `nfc_normalize` implements the
  * same UAX #15 form, which is what makes the oracle replay possible.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and is
  * true for the overwhelmingly-ASCII bulk of a crawl corpus — the copying
  * normalize pass runs only on rows that actually need composing. */
case class GraftNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    GraftNfc.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftNfc.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): GraftNfc =
    copy(child = newChild)
  override def prettyName: String = "graft_nfc"
}

object GraftNfc {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
