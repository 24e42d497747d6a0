package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A TPC-H-Q1-shaped pricing rollup: scan -> filter -> partial+final
    * hash-agg -> order, all inside whole-stage codegen.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every query runs under a UTC-aligned session regardless of what the
    * caller configured: timestamp-derived group keys (year(), date_format)
    * must not drift from the timezone-naive DuckDB oracle.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (LabQueries.queries ++ LlmQueries.queries ++ ExtQueries.queries ++
      TpchQueries.queries).map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        fn(graft.engine.SparkEngine.align(s), dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    LabQueries.oracleSql ++ LlmQueries.oracleSql ++ ExtQueries.oracleSql ++
      TpchQueries.oracleSql
}
