package graft

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.types._
import graft.sources.Sources

/** Boundary semantics of the schema-on-read text path (SURVEY.md S4/S5):
  * BOM strip, header death via parse guard, exact vs relaxed arity,
  * cast-to-null row drops, blank-line filtering.
  */
class SourcesSpec extends SparkSpec {

  private def tmpFile(lines: String*): String = {
    val p: Path = Files.createTempFile("graft-src", ".txt")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toFile.deleteOnExit()
    p.toString
  }

  private val yearTemp = StructType(Seq(
    StructField("year", StringType),
    StructField("temp", IntegerType)))

  test("S4: rows with unparseable ints are dropped, not failed (ANSI-safe)") {
    val path = tmpFile("1900 41", "1901 notanint", "1902 35")
    val rows = Sources.whitespace(spark, path, yearTemp)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows == Set("1900" -> 41, "1902" -> 35))
  }

  test("S4/S5: a UTF-8 BOM'd header line dies via the parse guard") {
    val path = tmpFile("﻿Year Temperature", "1900 41")
    val rows = Sources.whitespace(spark, path, yearTemp).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1900"))
  }

  test("exact arity drops over-long rows; relaxed arity keeps them") {
    val path = tmpFile("1900 41", "1901 42 junk")
    val exact = Sources.delimited(spark, path, "\\s+", yearTemp, exactArity = true)
    val relaxed = Sources.delimited(spark, path, "\\s+", yearTemp, exactArity = false)
    assert(exact.collect().map(_.getString(0)).toSeq == Seq("1900"))
    assert(relaxed.collect().map(_.getString(0)).sorted.toSeq == Seq("1900", "1901"))
  }

  test("under-arity and blank lines are dropped under either policy") {
    val path = tmpFile("1900 41", "", "   ", "1901")
    val rows = Sources.delimited(spark, path, "\\s+", yearTemp, exactArity = false).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1900"))
  }

  test("multi-char regex separators split like the reference (lab9 '::')") {
    val path = tmpFile("1::1193::great::x::y")
    val schema = StructType(Seq(
      StructField("f0", StringType),
      StructField("movie", StringType),
      StructField("tag", StringType)))
    val r = Sources.delimited(spark, path, "::", schema, exactArity = false).head()
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("1", "1193", "great"))
  }

  test("JSON round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    df.write.mode("overwrite").json(dir)
    val back = Sources.json(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (2L, "b")))
  }

  test("ORC round-trip (self-describing schema)") {
    val dir = Files.createTempDirectory("graft-orc").toString
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "x")
    df.write.mode("overwrite").orc(dir)
    val back = Sources.orc(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "x"))
    assert(back.count() == 2)
  }

  test("S5 explicit: prefix header heuristic drops headers that parse as valid strings") {
    // all-string schema: the S4 numeric guard can't catch this header
    // (the reference's lab8 startsWith("Transaction") case)
    val schema = StructType(Seq(
      StructField("txn", StringType),
      StructField("country", StringType)))
    val path = tmpFile("Transaction_date,Country", "t1,Germany", "t2,France")
    val noHeuristic = Sources.delimited(spark, path, ",", schema)
      .collect().map(_.getString(0)).toSet
    assert(noHeuristic == Set("Transaction_date", "t1", "t2"),
      "without the heuristic the header row survives — that's the gap")
    val withHeuristic = Sources.delimited(spark, path, ",", schema,
        headerPrefixes = Seq("Transaction"))
      .collect().map(_.getString(0)).toSet
    assert(withHeuristic == Set("t1", "t2"))
    // equality form: the prefix covering the whole first token
    // (equalsIgnoreCase("year"), lab6:84) — and case-insensitivity
    val p2 = tmpFile("YEAR jan", "1900 41")
    val r2 = Sources.delimited(spark, p2, "\\s+",
        StructType(Seq(StructField("year", StringType), StructField("jan", StringType))),
        headerPrefixes = Seq("year"))
      .collect().map(_.getString(0)).toSeq
    assert(r2 == Seq("1900"))
  }

  test("CRLF line endings parse identically to LF (trailing \\r trimmed before split)") {
    val path = tmpFile("1900 41\r", "1901 35\r", "1902 20")
    val rows = Sources.whitespace(spark, path, yearTemp)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows == Set("1900" -> 41, "1901" -> 35, "1902" -> 20),
      "Windows-origin files must parse like Unix ones")
  }

  test("string-typed fields never cause drops (nulls only come from casts)") {
    val path = tmpFile("a b", "c d")
    val schema = StructType(Seq(StructField("x", StringType), StructField("y", StringType)))
    assert(Sources.delimited(spark, path, "\\s+", schema).count() == 2)
  }

  test("ignoreCorruptFiles: a truncated parquet part fails loudly by default, skips when opted in") {
    // The production posture for a 100 TB lake with occasional bad
    // parts: default = fail (silent data loss is worse than a failed
    // job); spark.sql.files.ignoreCorruptFiles=true = read what's
    // readable, for the explicit salvage pass.
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/t"
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(path)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 4)
    // truncate one part mid-file: valid magic, destroyed footer
    val raf = new java.io.RandomAccessFile(parts.head, "rw")
    raf.setLength(raf.length() / 2)
    raf.close()

    val err = intercept[Exception] { spark.read.parquet(path).count() }
    assert(err.getMessage != null)
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      // the salvage read needs an EXPLICIT schema: inference itself may
      // pick the corrupt footer, and ignoreCorruptFiles governs the data
      // scan, not footer-based schema discovery
      val schema = StructType(Seq(StructField("id", org.apache.spark.sql.types.LongType)))
      val n = spark.read.schema(schema).parquet(path).count()
      assert(n > 0 && n < 1000, s"expected partial rows from 3 good parts, got $n")
    } finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
  }
}
