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

  test("ANALYZE stats flip physical decisions: broadcast choice and join order") {
    // Round-10 CatalogSpec proved stats EXIST and shrink estimates; this
    // pins that they CHANGE THE PLAN — the thing a 1000-executor cluster
    // actually buys from ANALYZE. Two decisions, same mechanism:
    //
    //  (a) broadcast choice: a filtered dimension whose RAW size exceeds
    //      autoBroadcastJoinThreshold is shuffle-joined under size-only
    //      estimation (Filter passes its child's sizeInBytes through
    //      unreduced), but broadcast-joined once column stats let
    //      FilterEstimation shrink the post-filter size below the
    //      threshold;
    //  (b) join order: with CBO + joinReorder on and rowCounts on every
    //      side, the selective-dimension join is planned FIRST even when
    //      the SQL text joins the unselective dimension first.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    Seq("graft_cbo_fact", "graft_cbo_dima", "graft_cbo_dimb")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.range(20000).select(
        (col("id") % 2000).as("k1"), (col("id") % 200).as("k2"),
        concat(lit("payload-payload-payload-"), col("id")).as("p"))
      .write.saveAsTable("graft_cbo_fact")
    spark.range(2000).select(
        col("id").as("k1"), concat(lit("dima-text-text-text-text-"), col("id")).as("a"))
      .write.saveAsTable("graft_cbo_dima")
    spark.range(200).select(
        col("id").as("k2"), concat(lit("dimb-text-text-text-text-"), col("id")).as("b"))
      .write.saveAsTable("graft_cbo_dimb")

    val savedConfs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    def restore(): Unit = savedConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    try {
      // AQE off: this pins the STATS-driven (compile-time) decision, not
      // the runtime rescue; threshold sized between the filtered estimate
      // (~50 rows of dimb) and its raw size
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")

      def bhjCount(plan: SparkPlan): Int = plan.collect { case b: BroadcastHashJoinExec => b }.size
      val joinSql =
        """SELECT f.p, b.b FROM graft_cbo_fact f
          |JOIN graft_cbo_dimb b ON f.k2 = b.k2 WHERE b.k2 < 50""".stripMargin

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val noStatsPlan = spark.sql(joinSql).queryExecution.executedPlan
      assert(bhjCount(noStatsPlan) === 0,
        s"dimb (raw size > threshold) must shuffle-join without stats:\n$noStatsPlan")

      Seq("graft_cbo_fact", "graft_cbo_dima", "graft_cbo_dimb").foreach { t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val statsPlan = spark.sql(joinSql).queryExecution.executedPlan
      assert(bhjCount(statsPlan) === 1,
        s"column stats should shrink the filtered dim below the broadcast threshold:\n$statsPlan")

      // (b) join order: the SQL joins dima FIRST; the selective dimb
      // filter (k2 < 20 => ~10% of fact survives) makes fact JOIN dimb
      // the cheaper inner join — CBO must rewrite the order
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reorderSql =
        """SELECT f.p, a.a, b.b FROM graft_cbo_fact f
          |JOIN graft_cbo_dima a ON f.k1 = a.k1
          |JOIN graft_cbo_dimb b ON f.k2 = b.k2
          |WHERE b.k2 < 20""".stripMargin
      def innerJoinTables(df: org.apache.spark.sql.DataFrame): String = {
        val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
        assert(joins.size === 2, s"expected 2 joins:\n${df.queryExecution.optimizedPlan}")
        joins.last.toString // pre-order: last collected = deepest (first-executed)
      }
      val deepest = innerJoinTables(spark.sql(reorderSql))
      assert(deepest.contains("graft_cbo_dimb") && !deepest.contains("graft_cbo_dima"),
        s"CBO join reorder did not move the selective dimb join first:\n$deepest")

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val deepestNoCbo = innerJoinTables(spark.sql(reorderSql))
      assert(deepestNoCbo.contains("graft_cbo_dima"),
        s"without CBO the written order (dima first) should stand:\n$deepestNoCbo")
    } finally {
      restore()
      Seq("graft_cbo_fact", "graft_cbo_dima", "graft_cbo_dimb")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
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
