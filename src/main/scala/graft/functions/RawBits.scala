package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Raw IEEE-754 bit patterns of float/double columns, as native Catalyst
  * expressions (codegen'd — they stay inside WholeStageCodegen, unlike a
  * Scala UDF).
  *
  * Why: the reference's idempotent tail-overwrite rule compares points
  * BITWISE (memcmp of the raw chunk bytes — reference
  * src/libtsdb/wal.cc:104,116). Spark's `<=>`/`=` collapse NaN payloads and
  * -0.0 == 0.0, so float equality there is not bitwise. Comparing
  * `double_raw_bits(a) <=> double_raw_bits(b)` is (raw long bits preserve
  * NaN payloads and the sign of zero).
  */
case class DoubleRawBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"double_raw_bits requires DOUBLE, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleRawBits =
    copy(child = newChild)
  override def prettyName: String = "double_raw_bits"
}

case class FloatRawBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == FloatType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_raw_bits requires FLOAT, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    java.lang.Float.floatToRawIntBits(input.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Float.floatToRawIntBits($c)")
  override protected def withNewChildInternal(newChild: Expression): FloatRawBits =
    copy(child = newChild)
  override def prettyName: String = "float_raw_bits"
}

object GraftFunctions {

  /** Name → expression builder for every graft native function — the single
    * source for per-session registration (`register`) and cluster-wide
    * installation via `spark.sql.extensions` (graft.GraftExtensions). */
  val specs: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "double_raw_bits" -> (args => DoubleRawBits(args.head)),
    "float_raw_bits" -> (args => FloatRawBits(args.head)),
    "graft_dot" -> (args => DotProductDouble(args(0), args(1))),
    "graft_idot" -> (args => DotProductInt(args(0), args(1))),
    "graft_minhash" -> (args =>
      GraftMinHash(args(0), args(1).eval().asInstanceOf[Number].intValue)),
    "graft_simhash" -> (args =>
      GraftSimHash(args(0), args(1).eval().asInstanceOf[Number].intValue)),
    "graft_word_hashes" -> (args => GraftWordHashes(args.head)),
    "graft_bloom_contains" -> (args => GraftBloomContains(args(0), args(1),
      args(2).eval().asInstanceOf[Number].intValue,
      args(3).eval().asInstanceOf[Number].intValue)),
    "graft_text_counts" -> (args => GraftTextCounts(args.head)),
    "graft_gram_buckets" -> (args => GraftGramBuckets(args(0),
      args(1).eval().asInstanceOf[Number].intValue)),
    "graft_nfc" -> (args => GraftNfc(args.head)),
    "graft_bpe_tokens" -> (args => GraftBpeTokens(args.head)),
    "graft_unigram_tokens" -> (args => GraftUnigramTokens(args.head)),
    "graft_byte_bpe_ids" -> (args => GraftByteBpeIds(args.head)),
    "graft_byte_map_syms" -> (args => GraftByteMapSyms(args.head)),
    "graft_shingles" -> (args =>
      GraftShingles(args(0), args(1).eval().asInstanceOf[Number].intValue)),
    "graft_shingles_all" -> (args =>
      GraftShinglesAll(args(0), args(1).eval().asInstanceOf[Number].intValue)),
    "graft_shingles_all_wide" -> (args =>
      GraftShinglesAllWide(args(0), args(1).eval().asInstanceOf[Number].intValue)),
    // arg 1 is a foldable array<array<double>> literal (the trained
    // centroids) — evaluated once at resolution, then baked into the
    // expression as a reference object rather than plan literals
    "nearest_centroids" -> (args => {
      val cs = args(1).eval().asInstanceOf[ArrayData]
      val packed = (0 until cs.numElements()).map { i =>
        cs.getArray(i).toDoubleArray().toSeq
      }
      NearestCentroids(args(0), packed)
    }),
    "graft_lsh_buckets" -> (args => LshBuckets(args(0),
      args(1).eval().asInstanceOf[Number].intValue,
      args(2).eval().asInstanceOf[Number].intValue,
      args(3).eval().asInstanceOf[Number].intValue))
  )

  /** Idempotent per-session registration of the graft native functions. */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    specs.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** A column rewritten to an exactly-comparable form: float/double become
    * their raw bit patterns, everything else passes through (integer /
    * decimal / boolean equality is already exact). */
  def bitwiseComparable(c: Column, dt: DataType): Column = dt match {
    case DoubleType => call_function("double_raw_bits", c)
    case FloatType  => call_function("float_raw_bits", c)
    case _          => c
  }
}
