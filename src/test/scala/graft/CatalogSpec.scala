package graft

import org.apache.spark.sql.functions._

/** The SQL catalog face: managed parquet tables via DDL — CREATE TABLE,
  * INSERT INTO (from a query over the fixtures), SELECT, DROP — so a SQL
  * user can work entirely through table names instead of paths.
  */
class CatalogSpec extends SparkSpec {

  test("managed parquet table: DDL round-trip through the catalog") {
    spark.sql("DROP TABLE IF EXISTS graft_nation_summary")
    spark.sql(
      """CREATE TABLE graft_nation_summary (
        |  n_regionkey BIGINT, cnt BIGINT, first_nation STRING
        |) USING parquet""".stripMargin)
    try {
      assert(spark.catalog.tableExists("graft_nation_summary"))

      spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .createOrReplaceTempView("graft_nation_src")
      spark.sql(
        """INSERT INTO graft_nation_summary
          |SELECT n_regionkey, count(*) AS cnt, min(n_name) AS first_nation
          |FROM graft_nation_src GROUP BY n_regionkey""".stripMargin)

      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("n_regionkey").cast("long"), col("cnt").cast("long"), col("first_nation"))
        .orderBy("n_regionkey")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val viaTable = rows(spark.table("graft_nation_summary"))
      val direct = rows(
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("cnt"), min(col("n_name")).as("first_nation")))
      assert(viaTable.toSeq == direct.toSeq)

      // INSERT appends (no implicit overwrite)
      spark.sql("INSERT INTO graft_nation_summary VALUES (99, 0, 'SENTINEL')")
      assert(spark.table("graft_nation_summary").count() == direct.length + 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_nation_summary")
      assert(!spark.catalog.tableExists("graft_nation_summary"))
    }
  }

  test("ANALYZE TABLE: CBO column statistics drive the optimizer's row estimates") {
    // the stats surface a 100 TB cluster plans by: ANALYZE writes
    // table/column statistics into the catalog, and with CBO on the
    // optimizer estimates FILTERED cardinalities from them (histogram-
    // free ndv/min/max), which is what picks broadcast sides and join
    // orders when sizes can't be inferred from file lengths alone
    spark.sql("DROP TABLE IF EXISTS graft_li_stats")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
      .write.saveAsTable("graft_li_stats")
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      val actual = spark.table("graft_li_stats").count()
      spark.sql(
        "ANALYZE TABLE graft_li_stats COMPUTE STATISTICS FOR COLUMNS l_returnflag, l_quantity")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rc = spark.table("graft_li_stats").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.exists(_.toLong == actual),
        s"catalog rowCount $rc != actual $actual after ANALYZE")
      val filtered = spark.table("graft_li_stats")
        .where(col("l_quantity") < lit(5.0))
        .queryExecution.optimizedPlan.stats.rowCount
      assert(filtered.isDefined && filtered.get.toLong < actual,
        s"column stats did not shrink the filtered estimate: $filtered vs $actual")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.sql("DROP TABLE IF EXISTS graft_li_stats")
    }
  }
}
