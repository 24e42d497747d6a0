package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** Persisted-sketch rollup (SketchOps): q112 proves the contracts at the
  * fixtures' sparse-mode cardinalities; this spec forces DENSE HLL mode
  * (50k distinct keys >> 2^lgK registers) and a real parquet round trip,
  * the two conditions the query can't reach.
  */
class SketchSpec extends SparkSpec {

  test("sketch union is merge-invariant and within the error envelope in dense mode") {
    // 50k distinct keys across 10 daily buckets — far past the sparse
    // threshold, so union happens on dense register arrays.
    val df = spark.range(50000).select(
      (col("id") % 10).as("day"),
      concat(lit("user"), col("id")).as("key"))
    val daily = SketchOps.sketchBy(df, col("day"), col("key"))
    assert(daily.count() === 10)

    val merged = SketchOps.rollup(daily, lit(1))
      .head().getAs[Long]("approx_distinct")
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("key"))))
      .head().getLong(0)
    assert(merged === direct,
      s"dense-mode merge not invariant: merged=$merged direct=$direct")
    assert(math.abs(merged - 50000.0) <= 50000.0 * 0.05,
      s"estimate outside 5% envelope: $merged vs 50000")
  }

  test("bitmap sketch: exact distinct through parquet, idempotent under re-delivery") {
    import graft.operators.SketchOps
    // 30k keys spread over 5 days, every key delivered on TWO days (the
    // idempotence case HLL also handles but bitmaps must prove: OR-merge
    // counts a re-delivered key once)
    val df = spark.range(30000).select((col("id") % 5).as("day"), col("id").as("k"))
      .unionByName(spark.range(30000).select(((col("id") + 1) % 5).as("day"), col("id").as("k")))
    val dir = Files.createTempDirectory("graft-bitmap").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/daily"
    SketchOps.bitmapSketchBy(df, col("day"), col("k")).write.mode("overwrite").parquet(path)

    val merged = SketchOps.bitmapRollup(spark.read.parquet(path), lit(1))
      .head().getAs[Long]("exact_distinct")
    assert(merged === 30000L, s"bitmap rollup not exact/idempotent: $merged")

    // per-day counts are exact too (each day holds 2*6000 deliveries of
    // 12000 distinct keys)
    val perDay = SketchOps.bitmapRollup(spark.read.parquet(path), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDay.values.toSet == Set(12000L), s"per-day exact counts wrong: $perDay")
  }

  test("HistSketch bucket map: monotone, exact below 2^(b+1), relative error <= 2^-b") {
    import graft.operators.HistSketch
    val df = spark.range(1, 300000).select(col("id").as("v"))
      .withColumn("hb", HistSketch.bucketOf(col("v"), subBits = 5))
      .withColumn("lo", HistSketch.bucketLo(col("hb"), subBits = 5))
    // exactness below 64; monotone via per-row check against the previous
    // value's bucket (v and v-1 differ by at most one bucket step)
    assert(df.where(col("v") < 64 && col("hb") =!= col("v")).isEmpty)
    val prev = df.select(col("v").as("pv"), col("hb").as("phb"))
    assert(df.join(prev, col("v") === col("pv") + 1)
      .where(col("hb") < col("phb")).isEmpty, "bucket map not monotone")
    // lower bound law + value-space error envelope
    assert(df.where(col("lo") > col("v")).isEmpty, "bucketLo exceeded its value")
    assert(df.where((col("v") - col("lo")) * 32 > col("lo")).isEmpty,
      "bucket wider than 2^-5 relative")

    // negative input must fail the job, not mis-bucket silently
    val err = intercept[Exception] {
      spark.range(1).select(graft.operators.HistSketch.bucketOf(lit(-1L))).collect()
    }
    assert(err.getMessage.contains("non-negative"), s"wrong guard error: ${err.getMessage}")
  }

  test("HistSketch rollup: merge-invariant through parquet; envelope vs exact percentiles") {
    import graft.operators.HistSketch
    // skewed positive longs across 10 daily buckets
    val df = spark.range(1, 60001).select(
      (col("id") % 10).as("day"),
      (col("id") * col("id") % 1000000 + 1).as("v"))
    val dir = Files.createTempDirectory("graft-hist").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/daily"
    HistSketch.sketchBy(df, col("day"), col("v")).write.mode("overwrite").parquet(path)

    val qs = Seq((50, 100), (95, 100), (99, 100))
    val fromDisk = HistSketch.rollup(spark.read.parquet(path), lit(1), qs).head()
    val direct = HistSketch.rollup(
      HistSketch.sketchBy(df, lit(0), col("v")), lit(1), qs).head()
    assert(fromDisk == direct, s"round-tripped rollup diverged: $fromDisk vs $direct")
    assert(fromDisk.getLong(1) == 60000L)

    // each reported quantile is a lower bound of the exact one, within
    // 2^-5 relative in value space
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.95, 0.99), 0.0)
    for (((_, _), i) <- qs.zipWithIndex) {
      val lo = fromDisk.getLong(2 + i)
      val ex = exact(i)
      assert(lo <= ex + 1e-9, s"q${i}: lo $lo above exact $ex")
      assert((ex - lo) * 32 <= lo + 1e-9, s"q${i}: exact $ex outside envelope of $lo")
    }
  }

  test("sketch column survives a parquet round trip and still merges") {
    val df = spark.range(20000).select(
      (col("id") % 4).as("day"),
      col("id").as("key"))
    val dir = Files.createTempDirectory("graft-sketch").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/daily"
    SketchOps.sketchBy(df, col("day"), col("key"))
      .write.mode("overwrite").parquet(path)

    val fromDisk = SketchOps.rollup(spark.read.parquet(path), lit(1))
      .head().getAs[Long]("approx_distinct")
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("key"))))
      .head().getLong(0)
    assert(fromDisk === direct,
      s"round-tripped sketches diverged from direct build: $fromDisk vs $direct")
  }
}
