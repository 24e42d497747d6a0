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
      seed: Long = 0L,
      portable: Boolean = false): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0, 1]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(strataCol === lit(k), lit(r)).otherwise(acc)
    }
    // portable = sha2-derived unit (re-derivable anywhere sha256 exists,
    // like splitLabel) for auditable mixtures; default xxhash64 is the
    // cheaper in-engine form. The rate>0 guard short-circuits in codegen,
    // so rate-0 strata (defaultRate drops — potentially MOST rows) never
    // pay the sha256.
    if (portable) df.where(rate > lit(0.0) && sha2Unit(idCol, seed) < rate)
    else bernoulli(df, idCol, rate, seed)
  }

  /** Exactly-k uniform sample per group: the k smallest id-hashes win
    * (bottom-k sketch). Rides the bounded-heap TopKPerKey operator — no
    * per-group sort, k rows per (group x partition) cross the shuffle.
    */
  def perGroup(df: DataFrame, keys: Seq[Column], idCol: Column, k: Int, seed: Long = 0L): DataFrame =
    graft.plans.TopK.perKey(df, keys, Seq(hashUnit(idCol, seed).asc), k)

  /** Deterministic weighted sampling WITHOUT replacement, exactly k per
    * group (Efraimidis–Spirakis A-ES): each row draws its uniform u from
    * the engine-portable [[sha2Unit]] and scores `u^(1/w)`; the k
    * largest scores win, which selects each row with probability
    * proportional to its weight among the survivors — the standard
    * "sample documents by quality/length score" primitive of corpus
    * assembly, with NO RNG state: membership is a pure function of
    * (seed, id, weight), stable under re-partitioning, retries, and
    * re-runs, and re-derivable by any engine with sha256 + pow.
    *
    * The score is rounded to 6 decimals before ranking (ties then break
    * by id ascending): `pow` is the one non-portable step — libm last-ulp
    * differences could otherwise flip a rank across engines. Same
    * discipline as the q22 cosine ranking.
    *
    * Rides the bounded-heap TopKPerKey operator: no per-group sort, k
    * rows per (group x partition) cross the shuffle. Weights must be
    * strictly positive — a non-positive weight fails the job loudly
    * (`assert_true`) rather than silently hijacking the sample
    * (`pow(u, 1/w)` with w <= 0 would rank that row above every honest
    * one).
    */
  def weightedPerGroup(
      df: DataFrame,
      keys: Seq[Column],
      idCol: Column,
      weight: Column,
      k: Int,
      seed: Long = 0L): DataFrame = {
    val w = weight.cast("double")
    val score = coalesce(
      assert_true(w > 0, lit("weightedPerGroup weights must be strictly positive")),
      round(pow(sha2Unit(idCol, seed), lit(1.0) / w), 6))
    graft.plans.TopK.perKey(df, keys, Seq(score.desc, idCol.asc), k)
  }

  /** Engine-portable uniform unit in [0, 1) from (seed, id) — sha256 hex
    * digits instead of [[hashUnit]]'s xxhash64, so ANY engine with sha256
    * (DuckDB, Trino, plain Python) reproduces the same decision for the
    * same row. Use where the split/shuffle assignment must be auditable
    * OUTSIDE Spark (e.g. a held-out eval set whose membership is
    * re-derived downstream); [[hashUnit]] is the cheaper in-engine form.
    * 13 hex digits = 52 uniform bits, exact in a double.
    */
  def sha2Unit(id: Column, seed: Long): Column =
    conv(substring(sha2(concat_ws(":", lit(seed.toString), id.cast("string")), 256), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0) // 2^52

  /** Deterministic train/val/test labeling by cumulative hash thresholds:
    * fractions ((train,0.8),(val,0.1),(test,0.1)) label a row 'train' when
    * u < 0.8, 'val' when u < 0.9, else 'test'. A pure scan-stage
    * expression — no shuffle, no state; membership is stable under
    * re-partitioning, retries, and corpus growth (adding documents never
    * relabels existing ones — the property that keeps eval sets
    * uncontaminated across pipeline runs).
    */
  def splitLabel(id: Column, fractions: Seq[(String, Double)], seed: Long = 0L): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val u = sha2Unit(id, seed)
    // snap cumulative thresholds to 12 decimals: 0.8 + 0.1 accumulates to
    // 0.9000000000000001, which is NOT the double an engine parses from
    // the literal '0.9' — snapping makes the boundary identical to the
    // threshold any SQL re-derivation writes down
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.rint(c * 1e12) / 1e12)
    fractions.init.zip(cum.init).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), c), acc) => when(u < lit(c), lit(name)).otherwise(acc)
    }
  }

  /** Temperature-flattened source-mixture resample (the domain-rebalance
    * step of corpus assembly, DoReMi/multilingual-sampling style): source
    * s with n_s documents gets share ∝ n_s^T with T = 0.5 — large sources
    * are downweighted, small sources upweighted, without any source ever
    * being upsampled past its size. Everything that decides MEMBERSHIP is
    * exact integer arithmetic, so the selected set is engine-portable and
    * hash-verifiable:
    *   - integer weight  m_s    = floor(sqrt(n_s) * weightScale) — sqrt of
    *     an integer-valued double is correctly-rounded IEEE in every
    *     engine, one multiply + floor after it stays deterministic;
    *   - integer quota   q_s    = min(n_s, (Σn DIV den * num) * m_s DIV Σm)
    *     — pure integral division, no float shares;
    *   - membership: the q_s documents with the smallest seeded sha256
    *     digest (the q92 portable-hash order), rank restart per source.
    * Scale shape: the weight/quota side is one tiny aggregate over
    * DISTINCT sources (broadcast back); the corpus side is one hash
    * exchange on the source key + in-partition rank — the q92 per-shard
    * layout. Per-source rank is a per-source total order; skewed mega-
    * sources split the same way q92 shards do (rank within hash-sharded
    * sub-sources, then offset by shard prefix counts). Overflow boundary:
    * target * m_s brushes 2^63 once corpus count^1.5 * weightScale/den
    * exceeds 9.2e18 (~7e8 docs at the default scale) — drop weightScale
    * to 1e3 for another 1e3x of headroom, same documented discipline as
    * q108's Σc².
    */
  def mixtureResample(
      df: DataFrame,
      sourceCol: Column,
      idCol: Column,
      targetNum: Long = 1L,
      targetDen: Long = 2L,
      weightScale: Long = 1000000L,
      seed: Long = 0L): DataFrame = {
    require(targetNum > 0 && targetDen > 0 && weightScale > 0)
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(sourceCol.as("__src")).agg(count(lit(1)).as("__n"))
      .withColumn("__m",
        floor(sqrt(col("__n").cast("double")) * lit(weightScale.toDouble)).cast("long"))
    val tot = counts.agg(sum("__m").as("__msum"), sum("__n").as("__nd"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("__quota",
        least(col("__n"), expr(s"__nd DIV ${targetDen}L * ${targetNum}L * __m DIV __msum")))
      .select(col("__src"), col("__quota"))
    val hx = sha2(concat_ws(":", lit(seed.toString), idCol.cast("string")), 256)
    df.withColumn("__hx", hx)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(sourceCol).orderBy(col("__hx"), idCol)))
      .join(broadcast(quotas), sourceCol === col("__src"))
      .where(col("rnk") <= col("__quota"))
      .drop("__hx", "__src", "__quota")
  }

  /** Deterministic corpus shuffle for training order: assign each row a
    * shard (16 independent hash bits, uniform) and a position within its
    * shard (rank of the row's full hash). Reading shards in order, each
    * internally by position, yields a reproducible global permutation
    * WITHOUT a global total-order sort: one hash-partitioned exchange on
    * the shard key + a per-shard local sort — each shard is one writer
    * task at any corpus size (the standard shuffle-then-shard
    * pre-training layout). Shard and position use disjoint hex spans of
    * the same sha256, so they are independent but jointly reproducible
    * anywhere sha256 exists.
    */
  def shuffleShard(df: DataFrame, idCol: Column, shards: Int, seed: Long = 0L): DataFrame = {
    require(shards > 0 && shards <= 65536, "shards must fit the 16-bit hash span")
    import org.apache.spark.sql.expressions.Window
    val h = sha2(concat_ws(":", lit(seed.toString), idCol.cast("string")), 256)
    df.withColumn("__h", h)
      .withColumn("shard",
        (conv(substring(col("__h"), 14, 4), 16, 10).cast("long") % shards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("__h"), idCol)))
      .drop("__h")
  }
}
