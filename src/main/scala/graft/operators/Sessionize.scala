package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands) — the same session semantics
  * as the streaming `session_window` path ([[graft.streaming.Streaming
  * .userSessions]]), for users who want sessions over data at rest
  * without a streaming runtime. Adjacent events merge while the gap is
  * <= `gapSec` (matching session_window's merge rule), a strictly
  * greater gap opens a new session; `session_end` = last event + gap.
  *
  * Plan shape: ONE shuffle on the user key serves both the windows and
  * the final aggregation (same partitioning), so the whole operator is
  * shuffle-once at any scale; per-user state is a sort within the
  * partition, never a driver structure.
  */
object Sessionize {

  /** Sessions per `userCol` over integer-second `tsSecCol`, events
    * ordered (ts, id). Output: user, session_start, session_end,
    * n_events, first_event, last_event.
    */
  def batch(events: DataFrame, gapSec: Long,
            userCol: String = "user_id", tsSecCol: String = "tss",
            idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsSecCol, idCol)
    events
      .withColumn("_prev", lag(col(tsSecCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsSecCol) - col("_prev") > gapSec, 1)
          .otherwise(0))
      .withColumn("_sid", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_sid"))
      .agg(min(col(tsSecCol)).as("session_start"),
        (max(col(tsSecCol)) + gapSec).as("session_end"),
        count(lit(1)).as("n_events"),
        min(col(idCol)).as("first_event"), max(col(idCol)).as("last_event"))
      .drop("_sid")
  }
}
