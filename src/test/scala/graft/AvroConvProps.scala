package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalacheck.{Arbitrary, Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.avro.AvroConv

/** The `graft-avro` conversion layer under random fire, without Spark
  * jobs: random catalyst rows → rowWriter → a REAL avro container in
  * memory → recordReader → catalyst rows again, must be identical. This
  * is the layer q141/AvroSpec exercise at fixed points; here the values
  * (including NULL placement, negative timestamps, empty strings/bytes)
  * are adversarial.
  */
object AvroConvProps extends Properties("graft-avro") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val schema = StructType(Seq(
    StructField("l", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("ts", TimestampType),
    StructField("day", DateType)))

  private val genValue: Seq[Gen[Any]] = Seq(
    Arbitrary.arbitrary[Long],
    Arbitrary.arbitrary[Int],
    // NaN compares unequal to itself; use finite doubles/floats
    Gen.chooseNum(-1e12, 1e12).map(identity[Double]),
    Gen.chooseNum(-1e6f, 1e6f).map(identity[Float]),
    Arbitrary.arbitrary[Boolean],
    Gen.asciiPrintableStr.map(s => UTF8String.fromString(s): Any),
    Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte]).map(identity[Any]),
    Arbitrary.arbitrary[Long], // micros, any epoch offset
    Gen.chooseNum(-100000, 100000).map(identity[Any])) // epoch days

  private val genRow: Gen[GenericInternalRow] =
    Gen.sequence[Seq[Any], Any](genValue.map(g =>
      Gen.oneOf(g.map(v => v: Any), Gen.const(null: Any))))
      .map(vs => new GenericInternalRow(vs.toArray))

  property("rowWriter -> container -> recordReader is the identity") =
    forAll(Gen.listOfN(5, genRow)) { rows =>
      val avroSchema = AvroConv.toAvroSchema(schema, "prop_rec")
      val toRec = AvroConv.rowWriter(schema, avroSchema)
      val bytes = new ByteArrayOutputStream()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, bytes)
      rows.foreach(r => w.append(toRec(r)))
      w.close()

      val in = new DataFileStream(
        new ByteArrayInputStream(bytes.toByteArray),
        new GenericDatumReader[GenericRecord]())
      val fromRec = AvroConv.recordReader(schema, in.getSchema)
      val back = Iterator.continually(in).takeWhile(_.hasNext).map(s => fromRec(s.next())).toList
      in.close()

      back.size == rows.size && back.zip(rows).forall { case (a, b) =>
        schema.fields.indices.forall { i =>
          (a.isNullAt(i), b.isNullAt(i)) match {
            case (true, true) => true
            case (false, false) =>
              val (x, y) = (a.get(i, schema(i).dataType), b.get(i, schema(i).dataType))
              (x, y) match {
                case (p: Array[Byte], q: Array[Byte]) => java.util.Arrays.equals(p, q)
                case _ => x == y
              }
            case _ => false
          }
        }
      }
    }
}
