package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `graft-avro` DSv2 connector (sources/avro): type round-trips,
  * split-at-sync-marker reads, reader-schema column pruning, overwrite
  * truncation, and temp-file commit visibility.
  */
class AvroSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-avro").toFile
    d.deleteOnExit()
    d.toString
  }

  private val fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("flag", BooleanType),
    StructField("small", IntegerType),
    StructField("ratio", DoubleType),
    StructField("ratio_f", FloatType),
    StructField("blob", BinaryType),
    StructField("amount", DecimalType(12, 2)),
    StructField("day", DateType),
    StructField("at", TimestampType),
    StructField("tags", ArrayType(StringType)),
    StructField("attrs", MapType(StringType, LongType)),
    StructField("nested", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))))

  private def sampleRows: Seq[Row] = Seq(
    Row(1L, "alpha", true, 7, 1.5, 2.5f, Array[Byte](1, 2, 3),
      new java.math.BigDecimal("1234.56"), Date.valueOf("2024-01-15"),
      Timestamp.valueOf("2024-01-15 10:30:00.123456"),
      Seq("x", "y"), Map("k" -> 9L), Row(10L, "n1")),
    Row(2L, null, false, null, null, null, null,
      null, null, null, null, null, null),
    Row(3L, "gamma", null, -1, -0.25, 0f, Array[Byte](),
      new java.math.BigDecimal("-0.01"), Date.valueOf("1969-12-31"),
      Timestamp.valueOf("1969-12-31 23:59:59.999999"),
      Seq.empty[String], Map.empty[String, Long], Row(null, "n3")))

  test("round-trip: every supported type survives write -> read bit-for-bit") {
    val dir = tmpDir()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 2), fullSchema)
    df.write.format("graft-avro").mode("overwrite").save(dir)

    val back = spark.read.format("graft-avro").load(dir)
    // avro unions make every column nullable on read; compare data shape
    assert(back.schema.fieldNames.toSeq == fullSchema.fieldNames.toSeq)
    assert(back.schema.fields.map(_.dataType).toSeq ==
      fullSchema.fields.map(_.dataType).toSeq)
    // Row.toString renders Array[Byte] by identity — hex the blob first
    def render(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.withColumn("blob", hex(col("blob")))
        .orderBy("id").collect().map(_.toString).toSeq
    assert(render(df) == render(back))
  }

  test("overwrite truncates; append accumulates; partial temps invisible") {
    val dir = tmpDir()
    val one = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    one.write.format("graft-avro").mode("overwrite").save(dir)
    one.write.format("graft-avro").mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 20)
    one.write.format("graft-avro").mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 10)
    // no temp droppings left behind by committed writes
    val stray = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tmp"))
    assert(stray.isEmpty, s"stray temp files: ${stray.mkString(",")}")
  }

  test("split reads: a multi-block file splits at sync markers, no row lost or doubled") {
    val dir = tmpDir()
    // ~60k rows of ~40B records -> several 64KB avro blocks in ONE file
    spark.range(60000).coalesce(1)
      .select(col("id"), concat(lit("payload-"), col("id")).as(("s")))
      .write.format("graft-avro").option("compression", "null").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 1)
    withMaxPartitionBytes(64 * 1024) {
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.rdd.getNumPartitions > 1,
        s"expected >1 split over a ${files.head.length()}B file")
      assert(back.count() === 60000)
      assert(back.agg(sum("id")).head.getLong(0) === 60000L * 59999 / 2)
    }
  }

  test("column pruning: the scan's read schema carries only requested columns") {
    val dir = tmpDir()
    spark.range(100)
      .select(col("id"), col("id").cast("string").as("s"), (col("id") * 3).as("t"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    val pruned = spark.read.format("graft-avro").load(dir).select("t")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<t:bigint>"),
      s"pruned read schema missing from plan:\n$plan")
    assert(pruned.agg(sum("t")).head.getLong(0) === 3L * 99 * 100 / 2)
  }

  test("empty projection (count(*)) decodes zero columns but counts every row") {
    val dir = tmpDir()
    spark.range(1234).select(col("id"), col("id").cast("string").as("s"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 1234)
  }

  test("compression codecs round-trip (snappy default, deflate, null)") {
    for (codec <- Seq("snappy", "deflate", "null")) {
      val dir = tmpDir()
      spark.range(500).select(col("id"), lit("abcabcabc").as("s"))
        .write.format("graft-avro").option("compression", codec)
        .mode("overwrite").save(dir)
      assert(spark.read.format("graft-avro").load(dir).count() === 500, codec)
    }
  }

  test("per-file schema resolution: a file with reordered fields reads by NAME") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmpDir()
    val s1 = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("s").endRecord()
    val s2 = SchemaBuilder.record("r").fields()
      .requiredString("s").requiredLong("id").endRecord() // reversed order
    def writeFile(name: String, schema: org.apache.avro.Schema, rows: Seq[(Long, String)]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(dir, name))
      rows.foreach { case (id, s) =>
        val rec = new GenericData.Record(schema)
        rec.put("id", id); rec.put("s", s)
        w.append(rec)
      }
      w.close()
    }
    // listing sorts by path: a.avro's schema becomes the table schema and
    // b.avro must resolve against it by field name, not position
    writeFile("a.avro", s1, Seq(1L -> "one", 2L -> "two"))
    writeFile("b.avro", s2, Seq(3L -> "three"))
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
    val rows = back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set(1L -> "one", 2L -> "two", 3L -> "three"))
  }

  test("streaming: landing dir ingested incrementally, exactly once across restart") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    def land(ids: Range): Unit =
      spark.createDataFrame(ids.map(i => (i.toLong, s"doc-$i")))
        .toDF("id", "s").write.format("graft-avro").mode("append").save(dir)

    land(0 until 10)
    val out = tmpDir()
    def start() = spark.readStream.format("graft-avro").load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    def sink() = spark.read.parquet(out)

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(sink().count() === 10)
      land(10 until 25) // next trigger must discover exactly the new files
      q1.processAllAvailable()
      assert(sink().count() === 25)
    } finally q1.stop()

    // files landing while the stream is DOWN are picked up after restart
    // from the same checkpoint — exactly once: a replayed batch would
    // double ids already in the sink and shift count/sum
    land(25 until 30)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(sink().count() === 30,
        "restart must process ONLY the files landed since the checkpoint")
      assert(sink().agg(sum("id")).head.getLong(0) === (0 until 30).sum.toLong)
    } finally q2.stop()
  }

  test("streaming admission control: maxFilesPerTrigger drains a backlog in capped batches") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir(); val ckpt = tmpDir(); val out = tmpDir()
    // 7 landed files (one per coalesced write), cap 3 -> 3+3+1 batches
    (0 until 7).foreach { i =>
      spark.createDataFrame(Seq((i.toLong, s"f$i"))).toDF("id", "s")
        .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    }
    val q = spark.readStream.format("graft-avro")
      .option("maxFilesPerTrigger", "3").load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() === 7)
    assert(spark.read.parquet(out).agg(sum("id")).head.getLong(0) === 21L)
    val offsets = new java.io.File(ckpt, "offsets").listFiles()
      .filterNot(_.getName.startsWith("."))
    assert(offsets.length === 3,
      s"expected the 7-file backlog to drain in 3 capped batches, got ${offsets.length}")
  }

  private def withMaxPartitionBytes[A](n: Long)(body: => A): A = {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }
}
