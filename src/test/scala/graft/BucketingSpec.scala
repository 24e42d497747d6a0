package graft

import org.scalatest.BeforeAndAfterAll

/** Bucketing: pre-partitioned tables joining WITHOUT a shuffle — the
  * co-located-join strategy for repeated large-scale joins (write once
  * bucketed by the join key; every subsequent join reads the buckets
  * aligned and skips both Exchanges).
  */
class BucketingSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
  }

  test("bucketed co-located join: no hash-partition exchange on either side") {
    val a = (1 to 20000).map(i => (i % 512, i)).toDF("k", "va")
    val b = (1 to 10000).map(i => (i % 512, s"d$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").saveAsTable("graft_bucket_a")
    b.write.mode("overwrite").bucketBy(8, "k").saveAsTable("graft_bucket_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle-join decision
    try {
      val j = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      val expected = (for {
        (k, na) <- (1 to 20000).groupBy(_ % 512).view.mapValues(_.size)
      } yield na.toLong * (1 to 10000).count(_ % 512 == k)).sum
      assert(j.count() == expected)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed sides must join without re-shuffling:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan is not bucket-aware:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
