package graft

import org.apache.spark.sql.functions._
import graft.operators.AggOps
import graft.plans.TopK

/** The custom TopKPerKey operator (LogicalPlan + Strategy + Exec):
  * result parity with the window formulation, plan shape (partial +
  * final exec, no Sort), and edge cases.
  */
class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 5000)
    .map(i => (s"g${i % 23}", i * 131 % 4999, i))
    .toDF("g", "v", "id")
    .repartition(8)

  test("TopK.perKey == window row_number formulation") {
    val custom = TopK.perKey(sample, Seq(col("g")), Seq(col("v").desc, col("id").asc), 7)
      .select("g", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val window = sample
      .transform(AggOps.topK(Seq(col("g")), Seq(col("v").desc, col("id").asc), 7))
      .select("g", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(custom == window)
  }

  test("plan contains partial+final TopKPerKeyExec and no Sort before them") {
    val df = TopK.perKey(sample, Seq(col("g")), Seq(col("v").desc), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom exec missing:\n$p")
    // partial instance (flag true) feeding the final (flag false)
    assert(p.contains(", 3, true") && p.contains(", 3, false"),
      s"expected partial+final pair:\n$p")
    assert(!p.contains("Sort "), s"bounded-heap top-k must not sort partitions:\n$p")
  }

  test("optimizer rule rewrites row_number-filter-drop into TopKPerKey") {
    TopK.register(spark)
    val df = sample.transform(AggOps.topK(Seq(col("g")), Seq(col("v").desc, col("id").asc), 4))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"window top-k idiom was not rewritten:\n$p")
    assert(!p.contains("Window"), s"rank window should be gone:\n$p")
    // results must equal the un-rewritten semantics (computed manually)
    val got = df.select("g", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val expected = (1 to 5000).map(i => (s"g${i % 23}", i * 131 % 4999, i))
      .groupBy(_._1).values.flatMap(_.sortBy(t => (-t._2, t._3)).take(4)).toSet
    assert(got == expected)
  }

  test("optimizer rule leaves windows whose rank is still referenced") {
    TopK.register(spark)
    // q33 shape: the row_number is part of the output -> must NOT rewrite
    val df = sample.withColumn("seq",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("v").desc)))
      .where(col("seq") <= 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey"), s"must not rewrite when rank is consumed:\n$p")
  }

  test("partial-pass flush budget does not change results") {
    spark.conf.set("spark.graft.topk.partialFlushRows", "16") // force many flushes
    try {
      val got = TopK.perKey(sample, Seq(col("g")), Seq(col("v").desc, col("id").asc), 7)
        .select("g", "v", "id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      val expected = (1 to 5000).map(i => (s"g${i % 23}", i * 131 % 4999, i))
        .groupBy(_._1).values.flatMap(_.sortBy(t => (-t._2, t._3)).take(7)).toSet
      assert(got == expected)
    } finally spark.conf.unset("spark.graft.topk.partialFlushRows")
  }

  test("rewrite kill-switch restores the window plan") {
    TopK.register(spark)
    spark.conf.set("spark.graft.topk.rewrite.enabled", "false")
    try {
      val df = sample.transform(AggOps.topK(Seq(col("g")), Seq(col("v").desc), 2))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("TopKPerKey"), s"rewrite must honor the kill-switch:\n$p")
    } finally spark.conf.unset("spark.graft.topk.rewrite.enabled")
  }

  test("k larger than every group returns all rows") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    assert(TopK.perKey(df, Seq(col("g")), Seq(col("v").desc), 10).count() == 3)
  }

  test("empty keys = global top-k") {
    val df = (1 to 100).map(i => i * 37 % 101).toDF("v")
    val got = TopK.perKey(df, Nil, Seq(col("v").desc), 5)
      .collect().map(_.getInt(0)).toSet
    val expected = (1 to 100).map(i => i * 37 % 101).sorted.reverse.take(5).toSet
    assert(got == expected)
  }
}
