package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Spark <-> Avro schema and value conversion for the engine's own Avro
  * DataSource V2 ([[AvroDataSource]]).
  *
  * Built directly on the Avro library (avro-1.12.1, part of the Spark
  * distribution's classpath) — the spark-avro connector module is not
  * shipped here, so the engine provides its own mapping for the type
  * subset the catalog's tables use: boolean / int / long / float /
  * double / string / binary, date (logical `date` on int),
  * timestamp (logical `timestamp-micros` on long, session-TZ),
  * decimal(p,s) (logical `decimal` on bytes), and arrays of all of
  * these. Nullable fields map to `union(null, T)`, Avro's idiom.
  */
object AvroConversions {

  /** Spark -> Avro schema (record named `row`, fields in struct order). */
  def toAvroSchema(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable), null, null)
    }
    Schema.createRecord("row", null, "graft.avro", false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType   => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType   => Schema.create(Schema.Type.INT)
      case LongType      => Schema.create(Schema.Type.LONG)
      case FloatType     => Schema.create(Schema.Type.FLOAT)
      case DoubleType    => Schema.create(Schema.Type.DOUBLE)
      case StringType    => Schema.create(Schema.Type.STRING)
      case BinaryType    => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType | TimestampNTZType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(elem, containsNull) =>
        Schema.createArray(fieldSchema(elem, containsNull))
      case other =>
        throw new IllegalArgumentException(s"avro: unsupported Spark type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  /** Avro -> Spark schema (for read-side inference). */
  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"avro: expected record, got $schema")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = sparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"avro: only union(null, T) supported, got $s")
      (sparkType(nonNull.head)._1, branches.size > nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT  => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _                       => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (elem, elemNullable) = sparkType(s.getElementType)
      (ArrayType(elem, elemNullable), false)
    case other =>
      throw new IllegalArgumentException(s"avro: unsupported Avro type $other in $s")
  }

  /** One Avro datum -> the Catalyst value for `dt`. */
  def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                 => null
    case (u: Utf8, StringType)     => UTF8String.fromString(u.toString)
    case (s: String, StringType)   => UTF8String.fromString(s)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (b: java.nio.ByteBuffer, d: DecimalType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      Decimal(new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale), d.precision, d.scale)
    case (i: java.lang.Integer, DateType)       => i.intValue()
    case (l: java.lang.Long, TimestampType)     => l.longValue()
    case (list: java.util.Collection[_], ArrayType(elem, _)) =>
      new GenericArrayData(list.asScala.map(toCatalyst(_, elem)).toArray)
    case (x, _) => x // primitives pass through boxed
  }

  /** One Catalyst value (already extracted from InternalRow) -> Avro datum. */
  def toAvro(v: Any, dt: DataType, avro: Schema): Any = (v, dt) match {
    case (null, _)                   => null
    case (s: UTF8String, StringType) => s.toString
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (d: Decimal, _: DecimalType) =>
      java.nio.ByteBuffer.wrap(d.toJavaBigDecimal.unscaledValue().toByteArray)
    case (a: ArrayData, ArrayType(elem, _)) =>
      val elemSchema = nonNull(avro).getElementType
      val n = a.numElements()
      val out = new java.util.ArrayList[Any](n)
      var i = 0
      while (i < n) {
        out.add(toAvro(a.get(i, elem), elem, elemSchema))
        i += 1
      }
      out
    case (x, _) => x
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** GenericRecord -> InternalRow under `schema` (names matched by position
    * against the record's own schema at read time — the reader factory
    * aligns fields by name before rows flow).
    */
  def recordToRow(rec: GenericRecord, schema: StructType): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      values(i) = toCatalyst(rec.get(schema(i).name), schema(i).dataType)
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  /** InternalRow -> GenericRecord under the paired schemas. */
  def rowToRecord(row: InternalRow, schema: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
      rec.put(i, toAvro(v, f.dataType, avro.getFields.get(i).schema()))
      i += 1
    }
    rec
  }
}
