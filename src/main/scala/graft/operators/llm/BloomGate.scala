package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Bloom-gated decontamination: the large-blocklist complement to the
  * broadcast digest anti-join (q53, Dedup-style `left_anti` on a
  * broadcast contamination set).
  *
  * The broadcast path stops working when the blocklist itself is big —
  * a billion held-out digests is ~32 GB of keys, far past any broadcast
  * threshold, and the fallback (a plain shuffle anti-join) re-shuffles
  * the ENTIRE corpus on the digest: at 100 TB that shuffle, not the
  * scan, is the job. The classic fix is a Bloom filter gate:
  *
  *   1. aggregate the blocklist digests into ONE Bloom filter (bit-OR
  *      merge — commutative, so partial aggregation applies and the
  *      result is insertion-order independent). ~1.2 GB of bits encodes
  *      1e9 keys at 1% false positives — 25x smaller than the keys, and
  *      it ships to executors once, as a scalar-subquery result, the
  *      exact mechanism Spark's own runtime-filter injection uses;
  *   2. probe the filter in the corpus scan stage (map-side, codegen,
  *      no shuffle). `might_contain = false` is DEFINITIVE (Bloom
  *      filters have no false negatives): those rows are clean and
  *      bypass the join entirely;
  *   3. only the bloom-positive sliver — true hits plus the fp-rate
  *      tail of clean rows — takes the exact anti-join against the
  *      blocklist. The corpus-side shuffle volume drops from 100% of
  *      rows to (hit rate + fp rate), i.e. orders of magnitude.
  *
  * The final result is EXACT (the verifying anti-join removes every
  * false positive), which is why q111 hash-checks it against the same
  * plain anti-join SQL the broadcast path uses — the Bloom filter is a
  * pure shuffle-volume optimization, invisible in the answer.
  *
  * Built entirely from Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` over `xxhash64`
  * keys) — no hand-rolled sketch, and the probe passes its analysis-time
  * requirement (constant or scalar subquery) because the filter side IS
  * a scalar subquery (`Dataset.scalar()`), evaluated once per query.
  */
object BloomGate {

  /** `ceil(-n ln p / ln^2 2)` — the textbook optimal bit count for
    * `expectedItems` keys at false-positive rate `fpp`.
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** One-row DataFrame holding the serialized Bloom filter of
    * `xxhash64(key)` over `keys` (column name `bf`). Partial+final
    * aggregate; the binary is the only thing that crosses the wire.
    */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long, fpp: Double): DataFrame = {
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp)))
    keys.agg(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
  }

  /** Membership probe: `might_contain(filter, xxhash64(key))`. `filter`
    * must be a constant or scalar-subquery column (Spark enforces this
    * at analysis time — the filter value must be plan-static so the
    * probe can run in the scan stage).
    */
  def mightContain(filter: Column, key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(filter),
      GraftColumnBridge.expression(xxhash64(key))))

  /** Drop every `corpus` row whose `key` appears in `blocklist.(blockKey)`,
    * using the Bloom gate above. Exact result; `blocklist` may be
    * arbitrarily large (never broadcast, never collected).
    *
    * Plan shape: `corpus` is scanned twice (both scans map-only, filter
    * pushed to parquet where possible) — the bloom-negative branch flows
    * straight to the output with NO shuffle; the bloom-positive branch
    * is anti-joined on the key. At 100 TB the second scan is the cheap
    * part; the win is that the anti-join's corpus-side shuffle carries
    * only the positive sliver.
    */
  def decontaminate(
      corpus: DataFrame,
      blocklist: DataFrame,
      key: Column,
      blockKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = bloomOf(blocklist, blockKey, expectedItems, fpp).scalar()
    val block = blocklist.select(blockKey.as("__bloom_gate_key"))
    // NULL keys route explicitly to the clean branch: `might_contain`
    // evaluates to NULL for a NULL key, so without the isNull disjunct a
    // null-key row would satisfy NEITHER branch predicate and silently
    // vanish — whereas the plain anti-join this operator claims
    // equivalence with RETAINS null-key rows (null never equi-matches a
    // blocklist key). Same law on both branches keeps them a partition.
    val clean = corpus.where(key.isNull || !mightContain(bf, key))
    val candidates = corpus.where(key.isNotNull && mightContain(bf, key))
      .join(block, key === col("__bloom_gate_key"), "left_anti")
    clean.unionByName(candidates)
  }
}
