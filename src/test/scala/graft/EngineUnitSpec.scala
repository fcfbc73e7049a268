package graft

import graft.engine._
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Unit coverage for the engine support modules (schema json, raw-bits
  * expressions) — the surface ADVICE.md flagged as unexercised. */
class EngineUnitSpec extends SparkTestBase {
  import spark.implicits._

  test("MeasurementSchema json round-trips; corrupt json fails strictly") {
    val s = MeasurementSchema(Seq(
      Field("a", FieldType.U32), Field("v", FieldType.F64), Field("flag", FieldType.Bool)))
    assert(MeasurementSchema.fromJson(s.toJson) == s)
    // truncated json must FAIL, not parse as a field subset
    val truncated = s.toJson.dropRight(20) + "]}"
    intercept[InvalidSchemaException](MeasurementSchema.fromJson(truncated))
    intercept[InvalidSchemaException](MeasurementSchema.fromJson("{}"))
    intercept[InvalidSchemaException](MeasurementSchema.fromJson("""{"version":2,"fields":[]}"""))
  }

  test("MeasurementSchema validation matrix") {
    intercept[InvalidSchemaException](MeasurementSchema(Nil).validated())
    intercept[InvalidSchemaException](
      MeasurementSchema(Seq(Field("time_ns", FieldType.F64))).validated()) // reserved
    intercept[InvalidSchemaException](
      MeasurementSchema(Seq(Field("x", FieldType.F64), Field("x", FieldType.U32))).validated())
    intercept[InvalidSchemaException](
      MeasurementSchema(Seq(Field("a" * 124, FieldType.F64))).validated())
    intercept[InvalidSchemaException](
      MeasurementSchema((1 to 65).map(i => Field(s"f$i", FieldType.F64))).validated())
    // 64 fields is the reference max and is fine (constants.h:33)
    MeasurementSchema((1 to 64).map(i => Field(s"f$i", FieldType.F64))).validated()
  }

  test("raw-bits expressions distinguish -0.0/0.0 and NaN payloads; codegen path") {
    GraftFunctions.register(spark)
    val df = Seq(
      (0.0, 0.0f), (-0.0, -0.0f),
      (java.lang.Double.longBitsToDouble(0x7ff8000000000001L), Float.NaN))
      .toDF("d", "f")
      .select(call_function("double_raw_bits", col("d")).as("db"),
              call_function("float_raw_bits", col("f")).as("fb"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 0L && rows(1).getLong(0) == java.lang.Long.MIN_VALUE)
    assert(rows(0).getInt(1) != rows(1).getInt(1))
    assert(rows(2).getLong(0) == 0x7ff8000000000001L) // NaN payload preserved
    // type mismatch is a analysis-time failure, not a wrong answer
    intercept[Exception] {
      Seq(1).toDF("i").select(call_function("double_raw_bits", col("i"))).collect()
    }
  }

  test("SeriesRange json round trip + corrupt fails") {
    val r = SeriesRange(100L, 420L)
    assert(SeriesRange.fromJson(r.toJson) == r)
    assert(SeriesRange.fromJson(SeriesRange(1, 0).toJson) == SeriesRange(1, 0))
    intercept[InvalidSchemaException](SeriesRange.fromJson("""{"time_first":1}"""))
  }
}
