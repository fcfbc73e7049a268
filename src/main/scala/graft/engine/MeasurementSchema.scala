package graft.engine

import org.apache.spark.sql.types._

/** The reference's 7 primitive field types (reference
  * src/libtsdb/measurement.h:22-31) mapped onto Spark types. Spark has no
  * unsigned integers: u32 widens to LongType, u64 to DecimalType(20,0) so the
  * full range survives (SURVEY.md §1.2). */
sealed abstract class FieldType(val code: String, val spark: DataType)
object FieldType {
  case object Bool extends FieldType("bool", BooleanType)
  case object U32  extends FieldType("u32", LongType)
  case object U64  extends FieldType("u64", DecimalType(20, 0))
  case object F32  extends FieldType("f32", FloatType)
  case object F64  extends FieldType("f64", DoubleType)
  case object I32  extends FieldType("i32", IntegerType)
  case object I64  extends FieldType("i64", LongType)

  val all: Seq[FieldType] = Seq(Bool, U32, U64, F32, F64, I32, I64)
  def fromCode(c: String): FieldType =
    all.find(_.code == c).getOrElse(throw new InvalidSchemaException(s"unknown type code '$c'"))
}

final case class Field(name: String, ftype: FieldType)

/** A measurement's schema: an ordered list of nullable value fields. Every
  * point additionally carries the implicit non-null `time_ns` (u64
  * nanoseconds) and the `series` tag — those are never declared as fields
  * (reference doc/README.txt:107-109). */
final case class MeasurementSchema(fields: Seq[Field]) {
  import MeasurementSchema._

  def validated(): MeasurementSchema = {
    if (fields.isEmpty) throw new InvalidSchemaException("no fields")
    // reference constants.h:33 (max 64 fields), measurement.h:60 (name len),
    // measurement.cc:33-39 (charset)
    if (fields.size > 64) throw new InvalidSchemaException(s"${fields.size} fields > max 64")
    fields.foreach { f =>
      if (f.name.isEmpty || f.name.length > 123)
        throw new InvalidSchemaException(s"field name length ${f.name.length} not in [1,123]")
      if (!f.name.matches("[A-Za-z_][A-Za-z0-9_]*"))
        throw new InvalidSchemaException(s"invalid field name '${f.name}'")
      if (Reserved(f.name))
        throw new InvalidSchemaException(s"reserved field name '${f.name}'")
    }
    val dup = fields.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
    if (dup.nonEmpty) throw new InvalidSchemaException(s"duplicate field names: ${dup.mkString(",")}")
    this
  }

  /** Spark schema of the stored data files: time_ns + value fields (series
    * and bucket live in the partition directory structure). */
  def dataStruct: StructType =
    StructType(
      StructField(TimeCol, LongType, nullable = false) +:
      fields.map(f => StructField(f.name, f.ftype.spark, nullable = true)))

  /** Spark schema of a logical row as clients see it. */
  def rowStruct: StructType =
    StructType(
      StructField(SeriesCol, StringType, nullable = false) +:
      StructField(TimeCol, LongType, nullable = false) +:
      fields.map(f => StructField(f.name, f.ftype.spark, nullable = true)))

  def toJson: String =
    fields.map(f => s"""{"name":"${f.name}","type":"${f.ftype.code}"}""")
      .mkString("""{"version":1,"fields":[""", ",", "]}")
}

object MeasurementSchema {
  val SeriesCol = "series"
  val TimeCol = "time_ns"
  val BucketCol = "bucket"
  private val Reserved = Set(SeriesCol, TimeCol, BucketCol)

  private val FieldRe = """\{"name":"([A-Za-z_][A-Za-z0-9_]*)","type":"([a-z0-9]+)"\}""".r

  /** Strict parse of [[MeasurementSchema.toJson]] output. Field names are
    * validated to a safe charset at create time, so the regex grammar is
    * exact — and a full round-trip is required, so a corrupt or truncated
    * schema file FAILS instead of silently parsing as a field subset (the
    * reference throws corrupt_schema_file_exception on any malformed entry,
    * reference src/libtsdb/measurement.cc:29-41). */
  def fromJson(s: String): MeasurementSchema = {
    val fields = FieldRe.findAllMatchIn(s).map(m => Field(m.group(1), FieldType.fromCode(m.group(2)))).toSeq
    if (fields.isEmpty) throw new InvalidSchemaException(s"unparseable schema json: $s")
    val parsed = MeasurementSchema(fields).validated()
    if (parsed.toJson != s)
      throw new InvalidSchemaException(s"corrupt schema json (round-trip mismatch): $s")
    parsed
  }
}
