package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: per-key regular buckets with the gaps
  * filled in — the shape every downstream trainer/report wants ("one
  * row per user per day, even for quiet days").
  *
  * Scale design: the raw stream crosses exactly ONE shuffle, the
  * partial-aggregating bucket groupBy; everything after (span, grid,
  * fill) runs on the compacted bucket table, which is bounded by
  * keys × buckets, not by input rows. Grid rows are produced by
  * `sequence` + `explode` on the executors that own each key — no
  * driver-side date loop, no cross join against a calendar table.
  */
object Resample {

  /** Sum `valueCol` into `stepSec`-wide buckets per key, emit a row for
    * EVERY bucket between each key's first and last observation, and
    * forward-fill value-less buckets from the last observed bucket
    * (`n_obs = 0` marks them as filled).
    */
  def gapFill(events: DataFrame, keyCol: String, tsSecCol: String,
              valueCol: String, stepSec: Long): DataFrame = {
    val bucket = (col(tsSecCol) - pmod(col(tsSecCol), lit(stepSec))).as("bucket")
    val obs = events
      .groupBy(col(keyCol), bucket)
      .agg(round(sum(col(valueCol)), 2).as("v"), count(lit(1)).as("n_obs"))
    val grid = obs
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), lit(stepSec))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }
}
