package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the missing half of the
  * reference's bookmark pattern. Bookmarks make the *scan* incremental
  * (`glue_rds_to_redshift.py` reads only new rows per run), but the
  * reference then recomputes every report from scratch over the growing
  * warehouse. Keeping a mergeable per-key STATE (count/sum/min/max)
  * lets each run aggregate only the bookmark delta and fold it into
  * yesterday's state: cost per run is O(delta + keys), not O(history).
  *
  * Only algebraic aggregates live in the state — each merges by sum or
  * min/max, so `merge(aggregate(a), aggregate(b)) == aggregate(a ∪ b)`
  * exactly (longs) and to fold-order FP noise (doubles; spec-bounded).
  * Derived values (avg) are computed by [[finish]] at read time, never
  * stored, so they stay exact after any number of merges.
  */
object IncrementalAgg {

  /** Collapse raws into mergeable per-key state: n, sum, min, max of
    * `valueCol`. One partial-aggregating shuffle on the keys.
    */
  def aggregate(rows: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))

  /** Fold a delta state into an existing state. Shuffles only
    * state-sized data (one row per key per side) — the history raws are
    * never rescanned.
    */
  def merge(state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))

  /** Read-time view over a state: adds the non-mergeable derivations. */
  def finish(state: DataFrame): DataFrame =
    state
      .withColumn("total", round(col("total"), 2))
      .withColumn("mean", round(col("total") / col("n"), 4))
}
