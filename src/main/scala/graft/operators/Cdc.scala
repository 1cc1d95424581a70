package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction — the batch verbs behind the
  * reference's incremental-load pattern. The reference appends each
  * bookmark increment to the warehouse (`glue_rds_to_redshift.py`), which
  * accumulates one row per *change*; consumers usually want one row per
  * *key* (the current state) or the full validity history (a type-2
  * dimension). Both verbs below are one-shuffle at any scale.
  */
object Cdc {

  /** Latest row per key ("upsert compaction"): of all change rows for a
    * key, keep the one with the greatest `seqCols` (lexicographic), and
    * optionally drop keys whose winning row is a delete marker.
    *
    * Implemented as `max(struct(seqCols ++ payload))`, NOT a
    * `row_number() = 1` window. Struct buffers aren't hash-aggregable so
    * this plans as a SortAggregate (partition-local sort on the group
    * key), but the decisive part survives: a `partial_max` runs BEFORE
    * the exchange, so the shuffle carries at most one row per key per
    * input partition instead of every change row. A window formulation
    * shuffles the entire 100 TB log and sorts it by (key, seq) before
    * discarding all but one row per key. Deterministic as long as
    * `seqCols` is a total order within a key (e.g. ts + unique event
    * id).
    *
    * `isDelete` is evaluated against the *compacted* row: a key whose
    * latest change is a delete disappears, while delete-then-reinsert
    * keys survive with the reinserted state.
    */
  def latest(changes: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
             isDelete: Option[Column] = None): DataFrame = {
    val payload = changes.columns.filterNot(keyCols.contains).toSeq
    val packed = struct((seqCols ++ payload.filterNot(seqCols.contains)).map(col): _*)
    val compacted = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("_m"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"_m.$c").as(c)): _*)
    // NULL marker = not a delete: a bare `!d` would evaluate to NULL and
    // silently drop live keys under three-valued logic
    isDelete.fold(compacted)(d => compacted.where(!coalesce(d, lit(false))))
  }

  /** Type-2 slowly-changing dimension from a changelog: one row per
    * distinct state of `attrCols` per key, with `[valid_from, valid_to)`
    * validity bounds and the open (current) row flagged.
    *
    * Consecutive rows with unchanged attributes collapse first (change
    * capture redelivers unchanged snapshots; without the collapse every
    * redelivery would open a spurious version). Both the collapse and
    * the `valid_to = lead(valid_from)` computation run over the same
    * key partitioning, so the whole build is one hash shuffle; the
    * per-key work is a partition-local sort, never driver state.
    *
    * `tsCol` supplies the validity timestamps; `tieCol` (a unique id)
    * totally orders simultaneous changes.
    *
    * `keepTie = true` appends a `_tie` column — the `tieCol` value of the
    * change that OPENED each version — which [[scd2Merge]] needs to replay
    * a stored dimension's open rows through the same (ts, tie) total
    * order on the next incremental run.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String, attrCols: Seq[String],
           keepTie: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val collapsed = changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= attrs)
      .drop("_prev")
    val tie = if (keepTie) Seq(col(tieCol).as("_tie")) else Nil
    collapsed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, 1L).otherwise(0L))
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")) ++ tie: _*)
  }

  /** Incremental SCD2 merge — apply a changelog delta to an existing
    * type-2 dimension (built by [[scd2]] with `keepTie = true`) so that
    * the result is row-identical to `scd2(oldChanges ∪ delta)` WITHOUT
    * re-windowing the historical changelog.
    *
    * Contract (the engine's bookmark semantics, `graft.sources.Bookmarks`,
    * applied to dimension maintenance): per key, every delta change's
    * `(ts, tie)` is at-or-after the open version's `(valid_from, _tie)`.
    * Discrete bookmark-delimited runs satisfy this by construction — the
    * delta is the strictly-later key range. Under it, CLOSED version rows
    * are immutable: only the open row per touched key can gain a
    * `valid_to`, and only rows after it can appear. (A delta that
    * interleaves below the open row would need the collapsed-away
    * historical changes to re-derive reopenings; that regime is full
    * recompute's, not an incremental merge's.)
    *
    * Scale shape: the delta's distinct key set is broadcast, so the
    * dimension side is ONE map-only pass (broadcast semi/anti hash joins
    * — never shuffled, never sorted); the [[scd2]] window re-runs only
    * over open-rows-of-touched-keys ∪ delta — a delta-shaped frame. Per
    * run: O(|dim|) scan + O(|delta| log |delta|) sort inside one shuffle
    * whose volume is the delta, not the dimension. Pure redeliveries
    * (delta attrs equal the open row's) collapse away and leave the
    * dimension bit-identical.
    */
  def scd2Merge(dim: DataFrame, delta: DataFrame, keyCols: Seq[String],
                tsCol: String, tieCol: String, attrCols: Seq[String]): DataFrame = {
    val outCols = (keyCols ++ attrCols).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))
    val touched = delta.select(keyCols.map(col): _*).distinct()
    val closed = dim.filter(col("is_current") === 0).select(outCols: _*)
    val open = dim.filter(col("is_current") === 1)
    val openUntouched = open.join(broadcast(touched), keyCols, "left_anti")
      .select(outCols: _*)
    val replay = open.join(broadcast(touched), keyCols, "left_semi")
      .select(keyCols.map(col) ++
        Seq(col("valid_from").as(tsCol), col("_tie").as(tieCol)) ++
        attrCols.map(col): _*)
    val merged = scd2(
      replay.unionByName(
        delta.select((keyCols ++ Seq(tsCol, tieCol) ++ attrCols).map(col): _*)),
      keyCols, tsCol, tieCol, attrCols)
    closed.unionByName(openUntouched).unionByName(merged.select(outCols: _*))
  }
}
