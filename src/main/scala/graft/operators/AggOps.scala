package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped-aggregation operators (SURVEY.md §2b aggregation family).
  * All compile to partial+final HashAggregate — the map-side combine the
  * reference only applied in lab2 is automatic for every one of these.
  */
object AggOps {

  /** Count per group (lab8/ProductSalesAnalyzer.sh:98-103,
    * lab10/BookPublicationFrequency.sh:94-98).
    */
  def groupCount(key: Column*): DataFrame => DataFrame =
    df => df.groupBy(key: _*).agg(count(lit(1)).as("cnt"))

  /** Max per group (lab3/HighestTemperature.sh:105-109). */
  def groupMax(key: Column, value: Column, as: String = "max_value"): DataFrame => DataFrame =
    df => df.groupBy(key).agg(max(value).as(as))

  /** Row-wise (horizontal) max across columns
    * (lab6/MaxElectricityConsumption.sh:93-96 — the hand-fused row-max
    * loop; `greatest` keeps it inside one codegen stage).
    */
  def rowwiseMax(cols: Seq[Column]): Column = greatest(cols: _*)

  /** Grouped list-agg with canonical ordering: sort_array makes the
    * output deterministic where the reference's reduce-side iteration
    * order was not (SURVEY.md S6; lab4:110-118, lab9:88-93).
    */
  def listAgg(
      key: Column,
      value: Column,
      sep: String = ", ",
      as: String = "items"): DataFrame => DataFrame =
    df =>
      df.groupBy(key)
        .agg(concat_ws(sep, sort_array(collect_list(value))).as(as))

  /** Per-group argmax with a deterministic tie-break (the reference's
    * lab11/UberTripAnalyzer.sh:100-109 is first-seen-wins, which is
    * nondeterministic under parallel input order; we canonicalize to
    * smallest witness).
    *
    * Implemented as `max_by(struct(ord, witnesses), struct(ord, -tie))`
    * — a declarative aggregate, so Catalyst plans partial+final
    * HashAggregate: each map partition reduces its rows to ONE candidate
    * per group before the shuffle. At 100 TB that is the difference
    * between shuffling every row (the window/row_number form below) and
    * shuffling one row per (group x map-partition).
    *
    * `tieBreakAsc` columns must be numeric (they are negated to express
    * "smallest wins" inside a max — note `-Long.MinValue` overflows back
    * to `Long.MinValue`, so a tie-break column containing that sentinel
    * misorders; use [[argMaxWindow]] for such domains). Output: `part`
    * columns followed by `ord` and the tie-break/witness columns, under
    * their input names.
    */
  def argMax(
      part: Seq[String],
      ord: String,
      tieBreakAsc: Seq[String]): DataFrame => DataFrame = {
    require(part.nonEmpty,
      "argMax needs at least one grouping column; for a global argmax use " +
        "df.agg(max_by(...)) directly")
    df => {
      val payload = struct((ord +: tieBreakAsc).map(col): _*)
      val ranking = struct(col(ord) +: tieBreakAsc.map(c => -col(c)): _*)
      df.groupBy(part.map(col): _*)
        .agg(max_by(payload, ranking).as("__argmax"))
        .select(part.head, (part.tail :+ "__argmax.*"): _*)
    }
  }

  /** Window/row_number argmax variant: strictly heavier (full shuffle of
    * every row, no map-side reduction) but keeps ALL input columns and
    * supports non-numeric tie-breaks. Prefer [[argMax]] at scale.
    */
  def argMaxWindow(
      part: Seq[Column],
      ord: Column,
      tieBreak: Seq[Column]): DataFrame => DataFrame = {
    df => {
      val w = Window.partitionBy(part: _*).orderBy((ord.desc +: tieBreak.map(_.asc)): _*)
      df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
    }
  }

  /** Per-group top-k by `ord` (generalizes lab11's per-group top-1). */
  def topK(part: Seq[Column], ord: Seq[Column], k: Int): DataFrame => DataFrame =
    df => {
      val w = Window.partitionBy(part: _*).orderBy(ord: _*)
      df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k).drop("__rn")
    }

  /** Exact interpolated percentiles per group via count compression,
    * with FULLY PARALLEL rank resolution.
    *
    * Spark's built-in `percentile` aggregate holds a value->count map per
    * group in ONE executor's memory — on a distinct-heavy double column
    * (prices, scores) that map is proportional to group size, an OOM at
    * large scale. Here every stage is parallel and memory-bounded:
    *
    *   1. count compression — a partial+final hash aggregate over
    *      (group, value): the only pass over the full data;
    *   2. the compressed counts are RANGE-partitioned by (group, value)
    *      and stamped with their chunk id; because the group columns are
    *      a prefix of the range key, chunk order == value order within
    *      every group;
    *   3. per-(group, chunk) subtotals roll up to prefix offsets and
    *      group totals — windows over at most `shuffle.partitions` rows
    *      per group, never over the data;
    *   4. global cumulative ranks = chunk offset + a running sum local to
    *      each (group, chunk): every sort task is bounded by the range
    *      chunk size, NEVER by group size (no per-group serial CDF sort —
    *      a 3-group corpus resolves ranks across all partitions);
    *   5. a final hash aggregate picks the two values straddling each cut
    *      point.
    *
    * Same linear-interpolation semantics as `percentile` / DuckDB
    * `quantile_cont` (asserted in OperatorSpec): result =
    * v_lo + frac * (v_hi - v_lo) at 0-based position h = (n-1)*p, where
    * v at rank k is the value whose cumulative count range covers k.
    * NULL group keys form a group like any other (all joins here are
    * null-safe `<=>`), and a group whose values are ALL null is returned
    * with null percentiles — both matching the builtin.
    *
    * Output: `part` columns + one double column per entry of `ps`, named
    * by `names`.
    */
  def exactPercentiles(
      part: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      names: Seq[String]): DataFrame => DataFrame = {
    require(ps.nonEmpty && ps.length == names.length, "one output name per percentile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), "percentiles must be in [0, 1]")
    df => {
      val nChunks = df.sparkSession.sessionState.conf.numShufflePartitions
      // count-compress BEFORE the range exchange (the A/B ran 0.4s the
      // other way at sf0.1: range-partitioning raw rows ships 2x the
      // rows and its boundary sampling re-executes the scan). `counts`
      // is persisted because repartitionByRange executes its child TWICE
      // (boundary-sampling job + the exchange itself) — uncached, that
      // is two full aggregation passes. `ranged` is persisted so the
      // offsets branch and the rank branch below read the SAME
      // materialized partitioning — __pid must mean one thing.
      val counts = graft.engine.ManagedCache.persist(
        df.where(col(valueCol).isNotNull) // builtin percentile ignores nulls; so do we
          .groupBy(part.map(col) :+ col(valueCol): _*)
          .agg(count(lit(1)).as("__c")))
      val ranged = graft.engine.ManagedCache.persist(
        counts
          .repartitionByRange(nChunks, part.map(col) :+ col(valueCol): _*)
          .withColumn("__pid", spark_partition_id()))
      val wOff = Window.partitionBy(part.map(col): _*).orderBy(col("__pid").asc)
      val wAll = Window.partitionBy(part.map(col): _*)
      val offsets = ranged
        .groupBy(part.map(col) :+ col("__pid"): _*)
        .agg(sum(col("__c")).as("__ct"))
        .withColumn("__off", sum(col("__ct")).over(wOff) - col("__ct"))
        .withColumn("__n", sum(col("__ct")).over(wAll))
        .drop("__ct")
      // the (part, __pid) equi-join's hash distribution already satisfies
      // the local window's requirement — no exchange between them, just a
      // chunk-bounded sort
      val cdf = ranged.as("l")
        .join(offsets.as("r"),
          part.map(c => col(s"l.`$c`") <=> col(s"r.`$c`"))
            .foldLeft(col("l.__pid") === col("r.__pid"))(_ && _))
        .select(part.map(c => col(s"l.`$c`")) ++ Seq(
          col(s"l.`$valueCol`"), col("l.__c"), col("l.__pid"),
          col("r.__off"), col("r.__n")): _*)
        .withColumn("__cum", // inclusive global cumulative count
          col("__off") + sum(col("__c")).over(
            Window.partitionBy(part.map(col) :+ col("__pid"): _*)
              .orderBy(col(valueCol).asc)))
      val aggs = ps.zip(names).flatMap { case (p, name) =>
        val h = (col("__n") - 1).cast("double") * lit(p)
        val kLo = floor(h).cast("long")
        val kHi = least(kLo + 1, col("__n") - 1)
        def at(k: Column) = // value whose [cum - c, cum) rank range covers k
          max(when(col("__cum") - col("__c") <= k && k < col("__cum"), col(valueCol)))
        Seq(
          at(kLo).as(s"__lo_$name"),
          at(kHi).as(s"__hi_$name"),
          max(h - floor(h)).as(s"__f_$name")) // constant within a group
      }
      val computed = cdf.groupBy(part.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(part.map(col) ++ ps.zip(names).map { case (_, name) =>
          (col(s"__lo_$name")
            + col(s"__f_$name") * (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
        }: _*)
      // builtin percentile still RETURNS a group whose values are all
      // null (with a null result); the null filter above dropped those
      // rows. Such groups are exactly the IsNull rows' groups minus
      // `computed`'s keys — recovered from an IsNull-pushed scan (prunes
      // to metadata when the value column is null-free) instead of a
      // full-table re-scan. The anti-join is null-safe: a group whose KEY
      // is null is a group like any other (`=` would duplicate it).
      val missing = df.where(col(valueCol).isNull)
        .select(part.map(col): _*).distinct().as("g")
        .join(computed.as("p"),
          part.map(c => col(s"g.`$c`") <=> col(s"p.`$c`"))
            .foldLeft(lit(true))(_ && _),
          "left_anti")
        .select(part.map(col) ++ names.map(n => lit(null).cast("double").as(n)): _*)
      computed.unionByName(missing)
    }
  }

  /** Global rank + running sums over a total order, FULLY PARALLEL.
    *
    * The naive form — `row_number().over(Window.orderBy(...))` — is a
    * SinglePartition window: Spark moves the whole input through one
    * task, which at 100 TB funnels a data-proportional set (e.g. one row
    * per part key) through a single sorter. This operator computes the
    * identical result with the chunk-parallel machinery of
    * [[exactPercentiles]]:
    *
    *   1. range-partition the input on the order key and stamp each row
    *      with its chunk id — chunk order == global order;
    *   2. per-chunk row counts and sums roll up to prefix offsets — a
    *      window over at most `shuffle.partitions` rows, never the data;
    *   3. global rank = chunk-local `row_number` + broadcast offset, and
    *      each running sum = chunk-local running sum + its offset. Every
    *      sort task is bounded by the range chunk size.
    *
    * INPUT-SIZE-ADAPTIVE: a cached count routes inputs at or below
    * `smallInputRows` through the plain one-partition window (where the
    * chunk machinery's exchange + offsets join costs more than it
    * saves) and everything larger through the chunk-parallel path.
    *
    * `order` should be a TOTAL order (include a unique tie-break column)
    * for deterministic output — same requirement as the builtin window.
    * `rnName` gets the 1-based global rank as LONG (the builtin's
    * `row_number` is int, which overflows past 2^31 rows — cast it down
    * at the call site if hash-parity with an int oracle matters).
    * Each `(valueCol, outName)` in `cumSums` yields the inclusive
    * running sum of `valueCol` under the global order; value columns
    * must be non-null (a null would make the chunk-local running sum
    * null where the builtin carries the prior cumulative value).
    */
  def globalRank(
      order: Seq[Column],
      rnName: String,
      cumSums: Seq[(String, String)] = Nil,
      smallInputRows: Long = 100000L): DataFrame => DataFrame = { df =>
    // input-size-adaptive: one cached count picks the path. At or below
    // `smallInputRows` the plain one-partition window is both correct
    // and FASTER — the chunk-parallel path pays a range exchange, a
    // second persist and an offsets join that only amortize on big
    // inputs (the round-16 q128 regression was exactly this overhead on
    // a 15k-row frame). Above it, one partition is the scale-killer and
    // the chunk machinery takes over. The probe cache feeds whichever
    // path runs, so the count is the only extra job.
    val probe = graft.engine.ManagedCache.persist(df)
    if (probe.count() <= smallInputRows) {
      val w = Window.orderBy(order: _*)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = probe.withColumn(rnName, row_number().over(w).cast("long"))
      cumSums.foldLeft(ranked) { case (acc, (in, out)) =>
        acc.withColumn(out, sum(col(in)).over(wRun))
      }
    } else globalRankChunked(probe, order, rnName, cumSums)
  }

  private def globalRankChunked(
      df: DataFrame,
      order: Seq[Column],
      rnName: String,
      cumSums: Seq[(String, String)]): DataFrame = {
    val nChunks = df.sparkSession.sessionState.conf.numShufflePartitions
    // persisted: repartitionByRange executes its child twice (boundary
    // sampling + exchange), and the offsets branch and the rank branch
    // must read the SAME materialized chunking — __pid must mean one thing.
    val ranged = graft.engine.ManagedCache.persist(
      df.repartitionByRange(nChunks, order: _*)
        .withColumn("__pid", spark_partition_id()))
    val wOff = Window.orderBy(col("__pid").asc) // bounded: <= nChunks rows
    val perChunk = count(lit(1)).as("__rows") +:
      cumSums.map { case (in, out) => sum(col(in)).as(s"__s_$out") }
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(perChunk.head, perChunk.tail: _*)
      .select(col("__pid") +:
        (coalesce(sum(col("__rows")).over(wOff) - col("__rows"), lit(0L)))
          .as("__rnoff") +:
        cumSums.map { case (_, out) =>
          coalesce(sum(col(s"__s_$out")).over(wOff) - col(s"__s_$out"), lit(0L))
            .as(s"__off_$out")
        }: _*)
    val wLoc = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ranged
      .join(broadcast(offsets), "__pid")
      .withColumn(rnName, row_number().over(wLoc).cast("long") + col("__rnoff"))
    val withSums = cumSums.foldLeft(joined) { case (acc, (in, out)) =>
      acc.withColumn(out, sum(col(in)).over(wRun) + col(s"__off_$out"))
    }
    withSums.drop("__pid" +: "__rnoff" +: cumSums.map(c => s"__off_${c._2}"): _*)
  }
}

/** Generalized COO sparse matrix multiply (lab5/MatrixMultiplication.sh).
  *
  * The reference's map-side replication of A[i,k] to every (i,j) and
  * B[k,j] to every (i,j) with K hard-coded to 2 (lab5:86-98) IS a shuffle
  * join on A.col == B.row followed by a grouped dot product
  * (lab5:110-128). Expressed declaratively, Catalyst picks
  * broadcast-hash vs sort-merge and K is arbitrary. Duplicate COO entries
  * are summed implicitly, matching C[i,j] = sum_k (sum A[i,k]) (sum B[k,j]).
  */
object CooMatMul {
  def apply(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("row").as("i"), col("col").as("k"), col("val").as("va"))
    val r = b.select(col("row").as("k"), col("col").as("j"), col("val").as("vb"))
    l.join(r, "k")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("va") * col("vb")).as("val"))
  }
}
