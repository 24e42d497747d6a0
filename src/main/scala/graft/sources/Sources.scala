package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read sources reproducing the reference's ingestion semantics
  * (SURVEY.md §1):
  *
  *   - S4: malformed rows are silently dropped, never fail the job
  *     (reference guards row arity and catches NumberFormatException, e.g.
  *     lab3/HighestTemperature.sh:85-92). We express that as PERMISSIVE
  *     parsing plus cast-to-null filters — a failed `cast("int")` yields
  *     null exactly where the reference's parseInt would throw.
  *   - S5: header rows are dropped either by the csv reader's header option
  *     or by the same parse-failure path (lab3's header dies via S4).
  *
  * All readers return DataFrames with the caller's explicit schema — there
  * is no inference, mirroring the reference's fixed positional schemas.
  */
object Sources {

  /** Parquet fixture table, e.g. table(spark, sfDir, "lineitem"). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Canonicalize the events fixture's `ts` to epoch-NANOS LongType.
    *
    * The fixture has shipped with two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which the engine surfaces as
    * an epoch-nanos long via `spark.sql.legacy.parquet.nanosAsLong` — and
    * plain timestamp[us], which arrives as a (NTZ) timestamp column. Every
    * downstream operator is written against the widest representation
    * (epoch-nanos long, converted with integer `ts div 1000` where micros
    * are needed), so branch on the observed dtype here: a timestamp-typed
    * `ts` becomes `unix_micros(ts) * 1000` (lossless — a micros-precision
    * fixture has no sub-microsecond digits to drop), a long passes through.
    * The cast to TimestampType is an identity shift under the engine's UTC
    * session time zone, matching the tz-naive DuckDB oracle's epoch_us.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  /** Line-delimited JSON with explicit schema (no inference — mirrors the
    * engine's fixed-schema philosophy; missing fields are null).
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** ORC (self-describing columnar; schema travels with the file). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JDBC table read. The 4-arg overload issues ONE query over one
    * connection; use [[jdbcPartitioned]] for anything sizable.
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel JDBC read: `numPartitions` concurrent range queries over
    * `partitionColumn` (each executor pulls its own slice — the only
    * JDBC shape that scales past one connection's throughput). Filters
    * and column pruning push down into the remote SQL.
    */
  def jdbcPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)

  /** CSV with explicit schema. `header=true` covers the reference's
    * startsWith/equalsIgnoreCase header heuristics for well-formed files
    * (lab8:85, lab10:79, lab11:81).
    */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = false,
      sep: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Whitespace-separated text (lab3/6/7 style): read lines, split on
    * `\s+`, positional-cast into `schema`. Rows whose arity or numeric
    * parses fail are dropped (S4). A UTF-8 BOM on the first line (present
    * in lab3/Temperature.txt) is stripped before splitting.
    */
  def whitespace(spark: SparkSession, path: String, schema: StructType): DataFrame =
    delimited(spark, path, "\\s+", schema)

  /** Arbitrary-regex-delimited text: covers lab9's `::` records and any
    * separator the csv reader can't express. Rows where a numeric field
    * fails to parse are dropped (S4). Arity policy mirrors the reference:
    * `exactArity=true` drops rows with MORE fields than the schema too
    * (lab3's `parts.length == 2`); set it false for the labs that accept
    * extra trailing fields (lab9's `>= 3`, lab11's `>= 4`).
    */
  def delimited(
      spark: SparkSession,
      path: String,
      sepRegex: String,
      schema: StructType,
      exactArity: Boolean = true,
      headerPrefixes: Seq[String] = Nil): DataFrame = {
    val n = schema.fields.length
    val arityOk =
      if (exactArity) size(col("f")) === n else size(col("f")) >= n
    // S5, explicit form: the reference also drops headers by VALUE
    // heuristics — startsWith("Transaction") lab8:85, startsWith("ISBN")
    // lab10:79, equalsIgnoreCase("year") lab6:84. Needed for all-string
    // schemas, where a header line parses cleanly and the S4 numeric
    // guard below never fires. Case-insensitive prefix match on the
    // first field (equality is the prefix matching the whole token).
    val headerOk = headerPrefixes.foldLeft(lit(true)) { (acc, p) =>
      acc && !lower(col("f").getItem(0)).startsWith(p.toLowerCase)
    }
    val lines = spark.read
      .text(path)
      .select(regexp_replace(col("value"), "^﻿", "").as("value"))
      .where(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), sepRegex).as("f"))
      .where(arityOk && headerOk)
    // try_cast, not cast: Spark 4's ANSI mode makes a plain cast THROW on
    // malformed input, while the reference's contract (S4) is
    // catch-and-skip. try_cast yields null exactly where parseInt threw.
    val cols = schema.fields.zipWithIndex.map { case (fld, i) =>
      col("f").getItem(i).try_cast(fld.dataType).as(fld.name)
    }
    val parsed = lines.select(cols.toIndexedSeq: _*)
    // S4: any non-string field that failed its cast (null where the raw
    // token was non-null) marks the row malformed -> drop the row.
    schema.fields.filter(_.dataType != StringType).foldLeft(parsed) {
      case (df, fld) => df.where(col(fld.name).isNotNull)
    }
  }
}
