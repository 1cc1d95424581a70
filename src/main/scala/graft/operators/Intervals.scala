package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gaps-and-islands): merge each key's overlapping
  * or touching `[start, end]` intervals into maximal disjoint spans.
  *
  * The workhorse behind span-level dedup (merging overlapping redaction /
  * annotation spans before applying them), sessionized "busy time"
  * accounting, and compacting validity ranges.
  *
  * Plan shape: ONE hash shuffle on the key, then partition-local sort +
  * two window passes over the same ordering (running max of `end`, then a
  * running sum of new-island flags) and a final hash agg on (key, island)
  * that reuses the partitioning. Per-key state is a single running
  * maximum — a 100 TB history streams through each task; nothing is
  * collected.
  */
object Intervals {

  /** Coalesce intervals per key. Two intervals merge when
    * `next.start <= running_max(end)` (touching intervals merge; pass
    * closed-open bounds if touching must not merge). Emits one row per
    * merged span: key, span start/end, and how many raw intervals it
    * absorbed.
    */
  def coalesce(df: DataFrame, keyCol: String, startCol: String,
               endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    // strictly-preceding running max: the island test must not see the
    // current row's own end
    val prevMaxEnd = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("_new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
    flagged
      .withColumn("_island",
        sum(col("_new_island")).over(
          byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }
}
