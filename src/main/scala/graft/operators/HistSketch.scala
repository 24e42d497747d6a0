package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile histogram (HDR-histogram-style log buckets) — the
  * quantile member of the persisted-aggregate-table family (distinct:
  * `SketchOps` HLL; moments: q108 power sums; quantiles: this).
  *
  * Exact percentiles over raw data cannot be rolled up (yesterday's p99
  * says nothing about the month's p99), so a latency/price/size
  * dashboard over a 100 TB fact table either re-sorts raw history per
  * question or stores a mergeable summary per ingest bucket. This is
  * that summary: per-bucket COUNTS over a deterministic value-to-bucket
  * map, so
  *   - merge = integer vector add (sum counts by bucket) — associative,
  *     commutative, arrival/partition-order independent, trivially
  *     rollable to any grain, and the sketch table is plain (bucket,
  *     count) longs in parquet — no engine-private state;
  *   - the answer is DETERMINISTIC (same inputs → bit-identical
  *     quantiles, any partitioning) — unlike sampling/GK/KLL sketches
  *     whose result depends on merge order, this one hash-verifies
  *     against a SQL oracle (q116);
  *   - error is a PRIORI bounded, in value space: buckets below
  *     2^(subBits+1) hold ONE integer each (small values exact); above
  *     that, bucket width / bucket base <= 2^-subBits, so a reported
  *     quantile's true rank window spans values within relative error
  *     2^-subBits (subBits=5 → 3.1%; 7 → 0.8%). Bucket count grows
  *     LOGARITHMICALLY with the value range (~2^subBits buckets per
  *     octave, ~64*2^subBits total for the full long range), so the
  *     per-day sketch row count is a few thousand regardless of data
  *     volume.
  *
  * The bucket map is pure integer/bit arithmetic (floor-log2 via the
  * minimal binary-string length — `length(bin(v)) - 1`, exact in both
  * Spark and DuckDB, no floating-point log), which is what makes the
  * whole pipeline portable enough to hash-verify:
  *   e = floor(log2 v);  bucket = v                      if e <= subBits
  *                       ((e-b) << b) + (v >> (e-b))     otherwise
  * strictly monotone in v, so cumulative counts in bucket order are a
  * valid rank walk. Values must be non-negative longs (money in cents,
  * latencies in micros, sizes in bytes — the integer domains this
  * engine's discipline already uses).
  */
object HistSketch {

  private def shr(v: Column, n: Column): Column =
    GraftColumnBridge.column(ShiftRight(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(n)))
  private def shl(v: Column, n: Column): Column =
    GraftColumnBridge.column(ShiftLeft(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(n)))

  /** Deterministic value → bucket id (monotone; see object doc). A
    * negative input fails the job loudly (`assert_true`) rather than
    * landing in a garbage bucket — the histogram's domain is
    * non-negative integers by contract, and a silent mis-bucket would
    * corrupt every rollup that ever merges the sketch row.
    */
  def bucketOf(v: Column, subBits: Int = 5): Column = {
    require(subBits >= 1 && subBits <= 16, s"subBits out of range: $subBits")
    val vl = v.cast("long")
    val e = (length(bin(vl)) - 1).cast("int")
    val bucket = when(e <= subBits, vl).otherwise(
      ((e - subBits).cast("long") * (1L << subBits)) + shr(vl, e - lit(subBits)))
    // assert_true yields NULL when the predicate holds, throws otherwise
    coalesce(assert_true(vl >= 0, lit("HistSketch values must be non-negative")), bucket)
  }

  /** Bucket id → the bucket's smallest value (the reported quantile
    * representative; conservative lower bound of the true quantile).
    */
  def bucketLo(bucket: Column, subBits: Int = 5): Column = {
    val k = shr(bucket, lit(subBits)).cast("int")
    when(k <= 1, bucket).otherwise(
      shl(bucket - (k - 1).cast("long") * (1L << subBits), k - 1))
  }

  /** Per-(timeBucket, histogram-bucket) counts: the row an ingest job
    * appends per batch. One partial+final hash aggregate; only (two
    * longs, count) rows cross the shuffle.
    */
  def sketchBy(df: DataFrame, timeBucket: Column, v: Column, subBits: Int = 5): DataFrame =
    df.groupBy(timeBucket.as("bucket"), bucketOf(v, subBits).as("hb"))
      .agg(count(lit(1)).as("cnt"))

  /** Roll persisted histogram rows to a coarser grain and answer
    * quantiles. `qs` are (numerator, denominator) pairs; the target rank
    * is ceil(n*qn/qd), and the gate `cum >= ceil(n*qn/qd)` is evaluated
    * as `cum*qd >= n*qn` — for positive integers the two are equivalent,
    * and the multiply form needs no division at all, so no float (or
    * rounding-mode) boundary can flap between engines. Returns one row
    * per `group` value with `n_total` and one `p_<qn>_<qd>` column per
    * quantile (the bucket lower bound, exact for small values, within
    * 2^-subBits above).
    *
    * Scale shape: input is the sketch table (thousands of rows per time
    * bucket, NOT the raw data); the merge is one hash aggregate and the
    * rank walk is a per-group window over bucket order — group
    * cardinality is bounded by the bucket count, never by raw rows.
    */
  def rollup(
      sketches: DataFrame,
      group: Column,
      qs: Seq[(Int, Int)],
      subBits: Int = 5): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 0 && n <= d && d > 0 })
    val merged = sketches.groupBy(group.as("grp"), col("hb"))
      .agg(sum("cnt").as("cnt"))
    val w = Window.partitionBy("grp").orderBy("hb")
    val cum = merged
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n_total", sum("cnt").over(Window.partitionBy("grp")))
    val aggs = qs.map { case (qn, qd) =>
      min(when(col("cum") * qd >= col("n_total") * qn, bucketLo(col("hb"), subBits)))
        .as(s"p_${qn}_$qd")
    }
    cum.groupBy("grp")
      .agg(max("n_total").as("n_total"), aggs: _*)
  }
}
