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

  /** Stratified sampling (the deterministic face of `sampleBy`): each
    * stratum keeps rows at its own rate — the source-mixing primitive
    * (e.g. upsample low-resource languages, downsample boilerplate-heavy
    * sources). Strata missing from `rates` fall back to `defaultRate`
    * (0.0 = drop). Still a pure scan-stage filter: the rate ladder is a
    * constant-folded CASE WHEN, no join, no shuffle.
    */
  def stratified(
      df: DataFrame,
      strataCol: Column,
      rates: Map[String, Double],
      idCol: Column,
      defaultRate: Double = 0.0,
      seed: Long = 0L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0, 1]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(strataCol === lit(k), lit(r)).otherwise(acc)
    }
    bernoulli(df, idCol, rate, seed)
  }

  /** Exactly-k uniform sample per group: the k smallest id-hashes win
    * (bottom-k sketch). Rides the bounded-heap TopKPerKey operator — no
    * per-group sort, k rows per (group x partition) cross the shuffle.
    */
  def perGroup(df: DataFrame, keys: Seq[Column], idCol: Column, k: Int, seed: Long = 0L): DataFrame =
    graft.plans.TopK.perKey(df, keys, Seq(hashUnit(idCol, seed).asc), k)
}
