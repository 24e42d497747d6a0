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
}
