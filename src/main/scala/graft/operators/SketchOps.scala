package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BitmapBitPosition, BitmapBucketNumber, BitmapConstructAgg, BitmapCount, BitmapOrAgg}
import org.apache.spark.sql.functions._

/** Persisted-sketch rollups: the pre-aggregate-at-ingest / merge-at-query
  * pattern for distinct counting at 100 TB.
  *
  * A daily `COUNT(DISTINCT key)` over a raw fact table re-scans and
  * re-shuffles the whole table for every question asked of it, and exact
  * distinct counts cannot be rolled up (distinct-per-day does not sum to
  * distinct-per-month). The lakehouse answer is to aggregate each
  * ingest batch ONCE into a mergeable sketch (Datasketches HLL via
  * Spark's `hll_sketch_agg`) and store the few-KB binary next to the
  * batch's partition; every later rollup — any date range, any grouping
  * — is a `hll_union_agg` over sketch ROWS, never over raw data. The
  * 100 TB fact table is read once at ingest; month/quarter/year distinct
  * queries then touch kilobytes.
  *
  * What makes this sound rather than hopeful:
  *   - HLL registers are slot-wise maxima of key hashes, so sketch
  *     union is associative/commutative/idempotent — merging daily
  *     sketches yields REGISTER-IDENTICAL state to sketching the raw
  *     range directly (merge-invariance). q112 asserts this as a
  *     hash-checked boolean, not a tolerance;
  *   - the estimate's error is bounded (~1.6% RSE at the default
  *     lgConfigK=12); q112 also asserts the within-5% envelope against
  *     the exact count, per group, as oracle-checked output;
  *   - the sketch column is plain `binary` — it survives a parquet
  *     round trip (SketchSpec), so the "sketch table" is an ordinary
  *     table with no engine-private state.
  */
object SketchOps {

  /** One sketch row per `bucket` value (e.g. per ingest day): what the
    * ingest job appends to the persisted sketch table. One partial+final
    * hash-aggregate; the only shuffled payload is the sketch binary.
    */
  def sketchBy(df: DataFrame, bucket: Column, key: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(hll_sketch_agg(key).as("sketch"))

  /** Roll persisted sketches up to a coarser grain and estimate:
    * `group` is derived from `bucket` (day → month/quarter/...). Input
    * is the sketch table — the raw data is not touched.
    */
  def rollup(sketches: DataFrame, group: Column): DataFrame =
    sketches.groupBy(group.as("grp"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  // ---- EXACT distinct via partitioned bitmaps -------------------------
  // The deterministic counterpart of the HLL pair above, built on
  // Spark's bitmap aggregate family: a key k sets bit
  // bitmap_bit_position(k) in the bitmap numbered bitmap_bucket_number(k).
  // Each bitmap is 4096 BYTES = 32768 bits, so one bucket covers a
  // 32768-key range — size the expected bucket fan-out accordingly (a
  // dense 1e9-key domain yields ~30.5k bitmap rows per ingest bucket).
  // PRECONDITION: keys must be POSITIVE integers — Spark's
  // bitmap_bit_position is (k-1) % 32768, so k <= 0 folds onto other
  // keys' bits and the "exact" count silently undercounts; guard or
  // shift the domain first. OR-merge is idempotent — a key re-delivered
  // across days collapses to the same bit — and sum(bitmap_count) after
  // the OR is the EXACT distinct count, hash-verifiable against any
  // engine's COUNT(DISTINCT). Storage is O(key range)/8 bits worst case
  // vs HLL's fixed KBs: the exact form is the right trade for
  // dense/bounded key domains (user ids, custkeys), the HLL form for
  // open-ended ones.

  private def agg2(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    GraftColumnBridge.column(f.toAggregateExpression())
  private def ex(c: Column) = GraftColumnBridge.expression(c)

  /** Per-(ingest bucket, bitmap number) exact-membership bitmaps: what
    * the ingest job appends. One partial+final hash aggregate.
    */
  def bitmapSketchBy(df: DataFrame, bucket: Column, key: Column): DataFrame =
    df.groupBy(
        bucket.as("bucket"),
        GraftColumnBridge.column(BitmapBucketNumber(ex(key))).as("bno"))
      .agg(agg2(BitmapConstructAgg(BitmapBitPosition(ex(key)))).as("bm"))

  /** OR-merge persisted bitmaps to a coarser grain and count exactly:
    * two hash aggregates over sketch rows, raw data untouched.
    */
  def bitmapRollup(sketches: DataFrame, group: Column): DataFrame =
    sketches.groupBy(group.as("grp"), col("bno"))
      .agg(agg2(BitmapOrAgg(ex(col("bm")))).as("bm"))
      .groupBy("grp")
      .agg(sum(GraftColumnBridge.column(BitmapCount(ex(col("bm"))))).as("exact_distinct"))
}
