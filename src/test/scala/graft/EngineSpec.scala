package graft

import org.apache.spark.sql.functions._
import graft.engine.ManagedCache

/** The engine-layer contracts: session configuration (what every query
  * silently relies on) and the ManagedCache persist registry.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("session contract: AQE, UTC, tuned shuffle partitions, extensions live") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 64,
      "local sessions must not run Spark's default 200 shuffle partitions")
    // extensions: native SQL functions resolve, TopK strategy injected
    assert(spark.sql("SELECT simhash64('x')").head().getLong(0) != 0L)
    assert(spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
    assert(spark.experimental.extraOptimizations.contains(graft.plans.TopKRewriteRule))
  }

  test("ManagedCache tracks persists and unpersistAll releases them") {
    val df = ManagedCache.persist((1 to 100).toDF("v"))
    df.count() // materialize the cache
    assert(df.storageLevel.useMemory, "persist level must be set")
    ManagedCache.unpersistAll()
    // unpersist is async (blocking=false); the LEVEL is cleared synchronously
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "unpersistAll must clear the storage level")
    // correctness survives unpersist: recompute still works
    assert(df.agg(sum(col("v"))).head().getLong(0) == 5050L)
    // idempotent: empty registry is a no-op
    ManagedCache.unpersistAll()
  }
}
