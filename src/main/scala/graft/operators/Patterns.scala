package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence matching (the batch analogue of streaming CEP /
  * SQL MATCH_RECOGNIZE): find occurrences of `pattern` — event types in
  * strict (time, id) order — completing within a time window.
  *
  * Match semantics (deterministic, oracle-replayable): every event of the
  * TERMINAL pattern type anchors at most one match, built from its
  * tightest completing chain — the nearest strictly-preceding event of
  * the previous type, which itself carries the nearest preceding chain of
  * the type before it, and so on. If ANY subsequence for an anchor fits
  * the window, the tightest chain does too (its start is the latest
  * possible), so anchor-counting under tightest-chain semantics equals
  * exists-counting per anchor.
  *
  * Scale shape: stage k's "nearest preceding chain" is a running
  * `last(..., ignoreNulls)` window over the SAME (user, time) spec for
  * every stage, so the whole pattern plans as ONE hash exchange + ONE
  * sort followed by k back-to-back Window operators (spec-asserted) —
  * the as-of-join shape, never a self-join per stage, state bounded by
  * one chain per partition row at any corpus size.
  */
object Patterns {

  /** Per-user matches of `pattern` (≥ 2 event types) within `withinSec`.
    * Returns (user_id, n_matches, first_end_sec, first_span_sec) for
    * users with at least one match; `first` = earliest-completing match,
    * ties by event id.
    */
  def sequenceMatches(events: DataFrame, pattern: Seq[String],
                      withinSec: Long,
                      user: Column = col("user_id"),
                      tsSec: Column = col("tss"),
                      id: Column = col("event_id"),
                      typ: Column = col("event_type")): DataFrame = {
    require(pattern.size >= 2)
    // the window is applied AFTER the canonicalizing select below, so it
    // must reference the renamed columns — building it from the caller's
    // Columns would fail analysis for any non-default input columns
    val w = Window.partitionBy(col("user_id")).orderBy(col("tss"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1) // strictly preceding
    // stage 0: the chain start is the event's own ts at pattern head rows
    val base = events.select(user.as("user_id"), tsSec.as("tss"),
        id.as("event_id"), typ.as("event_type"))
      .withColumn("_c0", when(col("event_type") === pattern.head, col("tss")))
    // stage i carries the nearest strictly-preceding stage-(i-1) chain
    // into rows of type pattern(i); chained projections, same window spec
    val staged = (1 until pattern.size).foldLeft(base) { (df, i) =>
      df.withColumn(s"_c$i",
        when(col("event_type") === pattern(i),
          last(when(col("event_type") === pattern(i - 1), col(s"_c${i - 1}")),
            ignoreNulls = true).over(w)))
    }
    val startCol = col(s"_c${pattern.size - 1}")
    val matches = staged
      .where(col("event_type") === pattern.last && startCol.isNotNull &&
        col("tss") - startCol <= withinSec)
      .select(col("user_id"), col("tss"), col("event_id"),
        (col("tss") - startCol).as("span"))
    matches.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(struct(col("tss"), col("event_id"), col("span"))).as("_first"))
      .select(col("user_id"), col("n_matches"),
        col("_first.tss").as("first_end_sec"),
        col("_first.span").as("first_span_sec"))
  }
}
