package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without the cartesian blowup: Spark plans a plain
  * `point BETWEEN lo AND hi` theta join as broadcast-nested-loop — O(n*m)
  * compares and a broadcast of a whole side. This operator buckets the
  * range dimension instead: each left interval replicates to the buckets
  * it covers (`(hi-lo)/bucketWidth + 1` copies — bounded by construction),
  * each right point maps to exactly one bucket, a hash equi-join on the
  * bucket co-locates candidates, and the exact predicate filters within
  * the bucket. Cost: one hash shuffle of each side, candidate volume
  * `O(matches + rows * interval/bucketWidth)`.
  *
  * Choose `bucketWidth` near the typical interval length: much smaller
  * multiplies left-side copies; much larger grows in-bucket false
  * candidates.
  */
object RangeJoin {

  /** Rows of `left` x `right` where `right(point)` falls in
    * `[left(lo), left(hi)]` (inclusive both ends); `lo`/`hi`/`point` must
    * be integral (e.g. epoch nanos). Optional `keys` columns (present on
    * both sides) become part of the equi-join, e.g. a user id for
    * per-entity time windows.
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      lo: String,
      hi: String,
      point: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // the exact-predicate filter below resolves lo/hi/point by bare name
    // on the JOINED frame — shared non-key column names would be
    // ambiguous there, so reject them up front
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys.toSet - "__bucket"
    require(shared.isEmpty,
      s"RangeJoin requires disjoint non-key column names; shared: $shared")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "RangeJoin reserves the column name __bucket")
    // `div` (integral divide) via expr: Column./ is floating-point
    // division, which corrupts epoch-nanos (> 2^53) — same pitfall as
    // q27's timestamp handling. Names are backquoted for expr().
    val l = left.withColumn(
      "__bucket",
      explode(sequence(
        expr(s"cast(`$lo` as bigint) div $bucketWidth"),
        expr(s"cast(`$hi` as bigint) div $bucketWidth"))))
    val r = right.withColumn("__bucket", expr(s"cast(`$point` as bigint) div $bucketWidth"))
    l.join(r, keys :+ "__bucket")
      .where(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__bucket")
  }
}

/** Hot-key mitigation for shuffle joins: salting. AQE's skew-join split
  * handles most skew at runtime; explicit salting remains the tool when a
  * single key is so hot that even split partitions overwhelm one task's
  * build side, or when AQE is unavailable (streaming joins).
  *
  * The fact side's key is extended with a deterministic salt derived from
  * one of its own columns; the dimension side replicates `factor` times so
  * every (key, salt) bucket can still match. Result is identical to the
  * unsalted join; the hot key's rows now spread over `factor` tasks.
  */
object SkewJoin {

  def salted(
      facts: DataFrame,
      dims: DataFrame,
      keys: Seq[String],
      saltFrom: String,
      factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    val l = facts.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(factor)))
    val r = dims.withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
