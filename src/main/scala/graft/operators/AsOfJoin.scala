package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row with
  * `right.ts <= left.ts` within the same key — the time-series lookup the
  * reference has no analogue for (SURVEY.md §2b joins: "as-of — absent").
  *
  * Implementation is the scalable merge form, not a range join: both
  * sides are tagged and unioned, hash-partitioned by key, sorted by
  * (ts, tag) within partitions, and each left row picks up the running
  * `last` right payload via a window frame. Cost is ONE shuffle of
  * left+right plus a partition-local sort — the same shape as a
  * sort-merge join, with no quadratic candidate blowup however dense the
  * right side is. At equal timestamps the right row is visible to the
  * left row (inclusive <=; right sorts first via the tag).
  *
  * Determinism: if the right side can hold multiple rows at the same
  * (key, ts), pre-reduce it (e.g. `AggOps.argMax`) — otherwise which one
  * wins depends on sort ties.
  *
  * Output: every left column, plus each `rightPayload` column as
  * `<prefix><name>` (null where no right row precedes — filter on
  * `<prefix>` non-null for inner semantics).
  */
object AsOfJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {

    val reserved = Seq("__ts", "__tag", "__l", "__r", "__asof")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"AsOfJoin reserves internal column names $reserved; " +
      s"rename the input columns $clash")

    val lStruct = struct(left.columns.toIndexedSeq.map(left(_)): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rStruct = struct(rightPayload.toIndexedSeq.map(right(_)): _*)
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lNorm = left.select(
      keys.toIndexedSeq.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__tag"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    // Null-timestamp right rows are dropped: ascending-nulls-first ordering
    // would otherwise sort them BEFORE every real row, making a null-ts row
    // the "preceding" match for left rows that have no genuine match —
    // DuckDB's ASOF JOIN likewise excludes null join keys. Left rows with a
    // null timestamp are kept and (with right nulls gone) precede all right
    // rows, so they surface with a null asof payload, consistent with the
    // left-outer "no match" contract documented above.
    val rNorm = right.where(col(rightTs).isNotNull).select(
      keys.toIndexedSeq.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__tag"),
        lit(null).cast(lType).as("__l"),
        rStruct.as("__r")): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(
        col("__l.*") +:
          rightPayload.toIndexedSeq.map(p => col("__asof").getField(p).as(prefix + p)): _*)
  }
}
