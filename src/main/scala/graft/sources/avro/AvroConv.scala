package graft.sources.avro

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro {@code Schema} ⇄ Spark {@code StructType} and
  * {@code GenericRecord} ⇄ {@code InternalRow} conversion for the
  * `graft-avro` connector (GraftAvro.scala). Built on the core
  * `org.apache.avro` library alone — the `spark-avro` connector jar is
  * not in this image, so the mapping lives here.
  *
  * Type surface (fail-loudly beyond it): null/boolean/int/long/float/
  * double/string/enum/bytes/fixed, records, arrays, string-keyed maps,
  * `[null, T]` unions (→ nullable T), and the logical types date,
  * timestamp-millis/micros, local-timestamp-millis/micros (→ NTZ), and
  * decimal-over-bytes/fixed.
  * Multi-branch unions have no stable relational shape — rejected, not
  * guessed.
  */
object AvroConv {

  // ---- schema: avro -> spark -------------------------------------------

  /** (sparkType, nullable) for an avro schema node. */
  def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val (nulls, rest) = branches.partition(_.getType == Schema.Type.NULL)
      require(rest.size == 1,
        s"graft-avro: unsupported union ${s}: only [null, T] unions map to a column")
      val (dt, _) = toSparkType(rest.head)
      (dt, nulls.nonEmpty)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = toSparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }
      (StructType(fields), false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
          (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
          (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case other => sys.error(s"graft-avro: unsupported avro type $other in $s")
  }

  def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"graft-avro: top level must be a record, got $s")
    toSparkType(s)._1.asInstanceOf[StructType]
  }

  // ---- schema: spark -> avro -------------------------------------------

  /** Avro schema for `dt`; nullable columns become `[null, T]` unions.
    * Record names must be unique within one schema — derive them from the
    * field path.
    */
  def toAvroType(dt: DataType, nullable: Boolean, name: String): Schema = {
    val base = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, en) => Schema.createArray(toAvroType(et, en, name + "_item"))
      case MapType(StringType, vt, vn) => Schema.createMap(toAvroType(vt, vn, name + "_value"))
      case st: StructType => toAvroSchema(st, name)
      case other => sys.error(s"graft-avro: cannot write Spark type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  def toAvroSchema(st: StructType, name: String): Schema = {
    val b = SchemaBuilder.record(name).namespace("graft.avro").fields()
    st.fields.foldLeft(b) { (acc, f) =>
      val s = toAvroType(f.dataType, f.nullable, name + "_" + f.name)
      if (f.nullable) acc.name(f.name).`type`(s).withDefault(null)
      else acc.name(f.name).`type`(s).noDefault()
    }.endRecord()
  }

  /** The projection half of column pruning: the reader schema keeps only
    * `required`'s top-level fields, so the avro decoder SKIPS the bytes of
    * every other column (schema-resolution projection — the avro
    * equivalent of parquet column pruning; avro is row-major, so pruning
    * saves decode work, not I/O).
    */
  def pruneWriterSchema(writer: Schema, required: StructType): Schema = {
    // required-order, not writer-order: recordReader resolves positionally
    // against THIS schema, and avro schema resolution matches by name, so
    // reordering is free
    val byName = writer.getFields.asScala.map(f => f.name() -> f).toMap
    val fields = required.fieldNames.toSeq.map { n =>
      val f = byName.getOrElse(n, sys.error(s"graft-avro: column $n absent from file schema"))
      new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace, false, fields.asJava)
  }

  // ---- rows: avro -> spark ---------------------------------------------

  /** Value converter avro→catalyst for one spark type, built ONCE per
    * schema (not per row — the match runs at plan time, rows pay only the
    * closure call).
    */
  private def reader(dt: DataType, avro: Schema): Any => Any = {
    val nonNull: Schema = avro.getType match {
      case Schema.Type.UNION => avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      case _ => avro
    }
    val f: Any => Any = dt match {
      case StringType => v => UTF8String.fromString(v.toString)
      case BinaryType => {
        case bb: ByteBuffer => toBytes(bb)
        case fx: GenericData.Fixed => fx.bytes().clone()
        case v => v.asInstanceOf[Array[Byte]]
      }
      case TimestampType | TimestampNTZType =>
        nonNull.getLogicalType match {
          case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
            v => v.asInstanceOf[Long] * 1000L
          case _ => v => v.asInstanceOf[Long]
        }
      case d: DecimalType => { v =>
        val bytes = v match {
          case bb: ByteBuffer => toBytes(bb)
          case fx: GenericData.Fixed => fx.bytes()
        }
        Decimal(BigDecimal(new java.math.BigInteger(bytes), d.scale), d.precision, d.scale)
      }
      case st: StructType =>
        val conv = recordReader(st, nonNull)
        v => conv(v.asInstanceOf[GenericRecord])
      case ArrayType(et, _) =>
        val elem = reader(et, nonNull.getElementType)
        v => new GenericArrayData(
          v.asInstanceOf[java.util.Collection[Any]].asScala.iterator
            .map(x => if (x == null) null else elem(x)).toArray)
      case MapType(StringType, vt, _) =>
        val value = reader(vt, nonNull.getValueType)
        v => {
          val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala
          ArrayBasedMapData(
            m.keys.map(k => UTF8String.fromString(k.toString)).toArray,
            m.values.map(x => if (x == null) null else value(x)).toArray)
        }
      // int/long/float/double/boolean/date arrive as their JVM primitives;
      // date's epoch-day int IS catalyst's DateType encoding
      case _ => identity
    }
    f
  }

  /** GenericRecord → InternalRow converter for a record schema, resolved
    * positionally against the READER schema (the pruned one).
    */
  def recordReader(st: StructType, record: Schema): GenericRecord => InternalRow = {
    val convs = st.fields.zipWithIndex.map { case (sf, i) =>
      val af = record.getFields.get(i)
      require(af.name() == sf.name,
        s"graft-avro: reader schema mismatch at $i: avro ${af.name()} vs spark ${sf.name}")
      reader(sf.dataType, af.schema())
    }
    rec => {
      val out = new Array[Any](convs.length)
      var i = 0
      while (i < convs.length) {
        val v = rec.get(i)
        out(i) = if (v == null) null else convs(i)(v)
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  private def toBytes(bb: ByteBuffer): Array[Byte] = {
    val b = bb.duplicate()
    val out = new Array[Byte](b.remaining())
    b.get(out)
    out
  }

  // ---- rows: spark -> avro ---------------------------------------------

  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  /** Catalyst-value → avro-value getter for one spark type; works over
    * both rows and array slots (SpecializedGetters is the shared face).
    * `avro` is the NON-NULL field schema (union already stripped) — the
    * record schema nested converters must write into.
    */
  private def writer(dt: DataType, nullable: Boolean, avro: Schema): (SpecializedGetters, Int) => Any = {
    val get: (SpecializedGetters, Int) => Any = dt match {
      case StringType => (r, i) => r.getUTF8String(i).toString
      case BooleanType => (r, i) => r.getBoolean(i)
      case IntegerType | DateType => (r, i) => r.getInt(i)
      case ShortType => (r, i) => r.getShort(i).toInt
      case ByteType => (r, i) => r.getByte(i).toInt
      case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
      case FloatType => (r, i) => r.getFloat(i)
      case DoubleType => (r, i) => r.getDouble(i)
      case BinaryType => (r, i) => ByteBuffer.wrap(r.getBinary(i))
      case d: DecimalType =>
        (r, i) => ByteBuffer.wrap(
          r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.unscaledValue.toByteArray)
      case st: StructType =>
        val conv = rowWriter(st, avro)
        (r, i) => conv(r.getStruct(i, st.size))
      case ArrayType(et, en) =>
        val elem = writer(et, en, nonNull(avro.getElementType))
        (r, i) => {
          val arr = r.getArray(i)
          val n = arr.numElements()
          val out = new java.util.ArrayList[Any](n)
          var j = 0
          while (j < n) {
            out.add(if (arr.isNullAt(j)) null else elem(arr, j))
            j += 1
          }
          out
        }
      case MapType(StringType, vt, vn) =>
        val value = writer(vt, vn, nonNull(avro.getValueType))
        (r, i) => {
          val m = r.getMap(i)
          val keys = m.keyArray()
          val values = m.valueArray()
          val out = new java.util.HashMap[String, Any](m.numElements())
          var j = 0
          while (j < m.numElements()) {
            out.put(keys.getUTF8String(j).toString,
              if (values.isNullAt(j)) null else value(values, j))
            j += 1
          }
          out
        }
      case other => sys.error(s"graft-avro: cannot write Spark type $other")
    }
    if (nullable) (r, i) => if (r.isNullAt(i)) null else get(r, i) else get
  }

  private def nonNull(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION => s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    case _ => s
  }

  /** InternalRow → GenericRecord for `st` against record schema `avro`
    * (built once; rows pay only the closure calls).
    */
  def rowWriter(st: StructType, avro: Schema): InternalRow => GenericRecord = {
    val rec0 = nonNull(avro)
    val convs = st.fields.zipWithIndex.map { case (f, i) =>
      writer(f.dataType, f.nullable, nonNull(rec0.getFields.get(i).schema()))
    }
    row => {
      val rec = new GenericData.Record(rec0)
      var i = 0
      while (i < convs.length) {
        rec.put(i, convs(i)(row, i))
        i += 1
      }
      rec
    }
  }
}
