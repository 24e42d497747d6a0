package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Column profiling: the ANALYZE-style data-quality report a pipeline
  * runs on every newly landed source before trusting it.
  *
  * The naive profiler runs one job per column (or worse, one per
  * statistic); at 100 TB that re-scans the table 4x#columns times. This
  * one computes ALL per-column statistics in exactly TWO column-pruned
  * passes: one hash-aggregated pass for every long-buffered statistic
  * (counts, nulls, exact distincts via the Expand rewrite, byte
  * lengths), and one grouping-free — hence sort-free — pass for the
  * string-rendered min/max. They are separate because a string-buffered
  * min/max inside the distinct aggregate forces the WHOLE plan onto
  * SortAggregate, which sorts the (#cols+1)-fold Expand of the input —
  * measured 2.5x the whole profile's runtime. The two 1-row results
  * cross-join (broadcast) and pivot to one report row per column with a
  * generator — driver cost is #columns, not #rows.
  *
  * Statistics per column (chosen to be exactly reproducible across
  * engines — no doubles, so the report hash-verifies against a SQL
  * oracle; one report row per column, keyed `col_name`):
  *   - `n_rows`    total rows (same for every column; kept per row so
  *                 each line of the report is self-contained)
  *   - `n_null`    NULL count
  *   - `n_distinct` exact distinct count (NULL excluded). Exact distinct
  *                 is the one statistic that costs a shuffle: Spark
  *                 plans the multi-column form as ONE pass with an
  *                 Expand (#cols copies of the key stream). For a
  *                 quick look at a 100 TB table, `exact = false` swaps
  *                 in `approx_count_distinct` (HLL±5%, no Expand, pure
  *                 map-side) — same report schema.
  *   - `min_val` / `max_val` rendered as strings (dates/ints/strings
  *                 render identically everywhere; callers profiling
  *                 float columns should expect engine-specific text)
  *   - `total_bytes` sum of UTF-8 lengths of the rendered values — the
  *                 integer-exact stand-in for average width (avg is a
  *                 double; sum hash-verifies).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // Two aggregates, not one: a STRING-buffered min/max inside the same
    // agg as the countDistincts forces the whole plan onto SortAggregate
    // (string buffers are not hash-aggregable and min/max is not a
    // TypedImperativeAggregate, so ObjectHashAggregate doesn't apply) —
    // and the countDistinct rewrite's Expand multiplies the input
    // #cols+1 times, so the sort ran over that multiple of the table.
    // Split: the long-buffered aggregates (counts, distincts, lengths)
    // hash-aggregate over the Expand; the string min/max pass has NO
    // grouping keys, so its SortAggregate needs no sort at all. Two
    // column-pruned scans move strictly fewer bytes than one sorted
    // (#cols+1)-fold Expand.
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      val s = v.cast(StringType)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(v.isNull, lit(1))).as(s"__null_$c"),
        (if (exact) countDistinct(v) else approx_count_distinct(v)).as(s"__dist_$c"),
        coalesce(sum(length(s)), lit(0L)).as(s"__len_$c"))
    }
    val mmAggs: Seq[Column] = cols.flatMap { c =>
      val s = col(c).cast(StringType)
      Seq(min(s).as(s"__min_$c"), max(s).as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(df.agg(mmAggs.head, mmAggs.tail: _*)))
    // Pivot the single row to one report row per column.
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"),
        col(s"__len_$c").as("total_bytes"))
    }: _*)
    one.select(explode(rows).as("r")).select("r.*")
  }
}
