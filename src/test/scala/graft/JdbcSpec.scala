package graft

import java.util.Properties
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** JDBC source round-trip against embedded Derby (the only RDBMS on this
  * classpath): write -> read parity, filter pushdown into the remote SQL,
  * and the partitioned-read shape (N concurrent range queries) that makes
  * JDBC ingestion scale past a single connection.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new Properties()

  test("write -> read round-trip preserves rows and schema") {
    val df = Seq((1L, "ALGERIA", 0), (2L, "BRAZIL", 1), (3L, "CANADA", 1))
      .toDF("id", "name", "region")
    df.write.mode("overwrite").jdbc(url, "nations", props)
    val back = Sources.jdbc(spark, url, "nations", props)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "region"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      == Set((1L, "ALGERIA", 0), (2L, "BRAZIL", 1), (3L, "CANADA", 1)))
  }

  test("filters push down into the remote query") {
    Seq.tabulate(100)(i => (i.toLong, s"n$i")).toDF("id", "name")
      .write.mode("overwrite").jdbc(url, "pushdown_t", props)
    val q = Sources.jdbc(spark, url, "pushdown_t", props).where(col("id") > 90)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90"),
      s"filter did not push into the JDBC scan:\n$plan")
    assert(q.count() == 9)
  }

  test("partitioned read fans out into N range queries") {
    Seq.tabulate(1000)(i => (i.toLong, i % 7)).toDF("id", "v")
      .write.mode("overwrite").jdbc(url, "part_t", props)
    val df = Sources.jdbcPartitioned(spark, url, "part_t",
      partitionColumn = "id", lowerBound = 0L, upperBound = 1000L, numPartitions = 4, props)
    assert(df.rdd.getNumPartitions == 4, "read must fan out into 4 range slices")
    assert(df.count() == 1000, "range slices must cover every row exactly once")
    assert(df.agg(sum(col("v"))).head().getLong(0)
      == (0 until 1000).map(_ % 7).sum)
  }
}
