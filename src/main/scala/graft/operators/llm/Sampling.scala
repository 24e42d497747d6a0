package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Everything here is
  * HASH-derived — no RNG state, no seed files: the same input rows are
  * selected on every run, on any cluster, under any partitioning. That
  * reproducibility is what makes sampled eval sets and source-mixing
  * ratios auditable at 100 TB.
  */
object Sampling {

  /** Uniform double in [0, 1) derived from (seed, id): top 53 bits of the
    * xxhash64, scaled. Collision-free determinism per id.
    */
  def hashUnit(id: Column, seed: Long): Column =
    call_function("shiftrightunsigned", xxhash64(lit(seed), id), lit(11))
      .cast("double") / lit((1L << 53).toDouble)

  /** Keep each row independently with probability `rate` (a literal or a
    * per-row column, e.g. a per-source mixing weight joined on). The
    * decision is a pure filter — fully pushed into the scan stage, no
    * shuffle, no sort.
    */
  def bernoulli(df: DataFrame, idCol: Column, rate: Column, seed: Long = 0L): DataFrame =
    df.where(hashUnit(idCol, seed) < rate)

  /** Exactly-k uniform sample per group: the k smallest id-hashes win
    * (bottom-k sketch). Rides the bounded-heap TopKPerKey operator — no
    * per-group sort, k rows per (group x partition) cross the shuffle.
    */
  def perGroup(df: DataFrame, keys: Seq[Column], idCol: Column, k: Int, seed: Long = 0L): DataFrame =
    graft.plans.TopK.perKey(df, keys, Seq(hashUnit(idCol, seed).asc), k)
}
