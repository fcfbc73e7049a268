package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions

/** Cluster-wide installation of the graft native functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes every `graft_*` expression available in SQL and `call_function`
  * across all sessions without a code-side `GraftFunctions.register` call —
  * the standard `SparkSessionExtensions` deployment shape for a library of
  * custom Catalyst expressions. The DataFrame entry points in `graft.ops`
  * still self-register defensively, so either path works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder
      ))
    }
}
