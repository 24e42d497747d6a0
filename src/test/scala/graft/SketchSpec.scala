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
