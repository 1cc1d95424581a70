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
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val collapsed = changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= attrs)
      .drop("_prev")
    collapsed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, 1L).otherwise(0L))
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
