package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: project each key's irregular observations onto
  * a regular time grid, carrying the latest observation forward (the
  * gap-fill/downsample step in front of windowed feature pipelines).
  *
  * Implementation composes two scale-proven pieces:
  *   1. grid generation — one row per key for the bounds (a tiny
  *      aggregate), then a per-row `sequence` explode: no shuffle beyond
  *      the bounds aggregate, grid size = span/step per key;
  *   2. the as-of join of grid points against observations ([[AsOfJoin]]:
  *      union + ONE key shuffle + sorted window — never a range join).
  *
  * The grid starts at the first step boundary AT or AFTER the key's first
  * observation (every grid point therefore has a predecessor) and ends at
  * the key's last observation.
  *
  * @param tsCol   epoch-time LONG column (any unit, as long as `step`
  *                matches)
  * @param step    grid step in `tsCol` units
  * @param payload observation columns to carry forward (emitted as
  *                `asof_<name>`)
  */
object Resample {

  def forwardFill(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(
      keys.map(col) :+
        explode(sequence(
          // first grid point at or after __lo: ceil to the step via pmod,
          // which is floor-division-based — correct for NEGATIVE epochs
          // too (lo=-15, step=10 -> -10), where a truncating `div` ceil
          // would give 0 and disagree with a floor-division oracle
          expr(s"__lo + pmod($step - pmod(__lo, $step), $step)"),
          col("__hi"),
          lit(step))).as("grid_ts"): _*)
    AsOfJoin(grid, df, keys, "grid_ts", tsCol, payload)
  }
}
