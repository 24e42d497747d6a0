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

  /** Exact interpolated percentiles per group via count compression.
    *
    * Spark's built-in `percentile` aggregate holds a value->count map per
    * group in ONE executor's memory — on a distinct-heavy double column
    * (prices, scores) that map is proportional to group size, an OOM at
    * large scale. Here the heavy reduction is a fully parallel
    * partial+final count over (group, value); only the DISTINCT values of
    * each group flow into the cumulative-rank window (spillable sort),
    * and a final hash aggregate picks the two values straddling each cut
    * point. Memory is bounded at any group size; the only per-group
    * serial step is a sort of the group's distinct values.
    *
    * Same linear-interpolation semantics as `percentile` / DuckDB
    * `quantile_cont` (asserted in OperatorSpec): result =
    * v_lo + frac * (v_hi - v_lo) at 0-based position h = (n-1)*p, where
    * v at rank k is the value whose cumulative count range covers k.
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
      val w = Window.partitionBy(part.map(col): _*).orderBy(col(valueCol).asc)
      val whole = Window.partitionBy(part.map(col): _*)
      val cdf = df
        .where(col(valueCol).isNotNull) // builtin percentile ignores nulls; so do we
        .groupBy(part.map(col) :+ col(valueCol): _*)
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w)) // inclusive cumulative
        .withColumn("__n", sum(col("__c")).over(whole))
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
      // null (with a null result); the null filter above would silently
      // drop it — restore such groups via the distinct group list (small:
      // one row per group, broadcast)
      df.select(part.map(col): _*).distinct()
        .join(computed, part, "left")
    }
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
