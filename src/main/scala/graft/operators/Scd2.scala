package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 maintenance — the warehouse-side
  * complement of [[LakeTable]]'s source-wins MERGE: instead of
  * overwriting an entity's row, every attribute change CLOSES the
  * current row (stamps `valid_to`) and appends a new current one, so any
  * fact can be joined to the attribute values that were true AT ITS
  * TIME (the as-of face of dimension history).
  *
  * Contract: `history` carries `keyCols ++ attrCols ++ (validFrom,
  * validTo)` with `validTo IS NULL` marking the current row (at most one
  * per key); `changes` carries `keyCols ++ attrCols ++ tsCol`. Multiple
  * changes for one key inside a batch collapse to the LATEST by
  * (ts, attrs) before applying — intermediate states within one batch
  * are not historized, the standard batch-SCD trade.
  *
  * Rules (all in one pass):
  *   - changed attrs  → close current at the change ts + append new
  *     current (null-safe struct comparison, so NULL attribute values
  *     compare stably);
  *   - identical attrs → no-op (no empty history rows — re-delivered
  *     unchanged snapshots are absorbed, which also makes re-applying
  *     the same batch idempotent);
  *   - unknown key    → append as new current;
  *   - closed history rows pass through untouched.
  *
  * Scale shape: one shuffle of the CURRENT rows + the (collapsed) batch
  * on the key — closed history is passed through scan-only (and in a
  * LakeTable-backed deployment lives in untouched partitions that COW
  * never rewrites); nothing is ever updated in place.
  */
object Scd2 {

  def applyChanges(
      history: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String = "change_ts",
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val histCols = keyCols ++ attrCols ++ Seq(validFrom, validTo)
    def out(df: DataFrame): DataFrame = df.select(histCols.map(col): _*)

    // latest change per key (deterministic: ties on ts break by attrs)
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(struct(attrCols.map(col): _*), struct(col(tsCol) +: attrCols.map(col): _*))
          .as("__attrs"),
        max(col(tsCol)).as("__ts"))

    val cur = history.where(col(validTo).isNull)
    val past = history.where(col(validTo).isNotNull)

    val curAttrs = struct(attrCols.map(col): _*)
    val joined = cur.join(latest, keyCols, "left")
    val changed = col("__ts").isNotNull && !(curAttrs <=> col("__attrs"))

    val untouchedCurrent = out(joined.where(col("__ts").isNull || (curAttrs <=> col("__attrs"))))
    val closed = out(joined.where(changed).withColumn(validTo, col("__ts")))
    val reopened = joined.where(changed)
      .select(keyCols.map(col) ++
        attrCols.map(c => col(s"__attrs.$c").as(c)) ++
        Seq(col("__ts").as(validFrom), lit(null).cast(history.schema(validTo).dataType).as(validTo)): _*)
    val inserted = latest.join(cur.select(keyCols.map(col): _*), keyCols, "left_anti")
      .select(keyCols.map(col) ++
        attrCols.map(c => col(s"__attrs.$c").as(c)) ++
        Seq(col("__ts").as(validFrom), lit(null).cast(history.schema(validTo).dataType).as(validTo)): _*)

    past.select(histCols.map(col): _*)
      .unionByName(untouchedCurrent)
      .unionByName(closed)
      .unionByName(reopened)
      .unionByName(inserted)
  }

  /** As-of lookup into an SCD2 history: the attribute row valid at
    * `asOf` — `valid_from <= asOf < coalesce(valid_to, +inf)`. By
    * construction each key has at most one matching row, so this is a
    * plain (broadcastable when the dimension is small) equi-join plus a
    * range predicate — no window needed.
    */
  def asOf(history: DataFrame, asOfTs: Column, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame =
    history.where(col(validFrom) <= asOfTs &&
      (col(validTo).isNull || asOfTs < col(validTo)))
}
