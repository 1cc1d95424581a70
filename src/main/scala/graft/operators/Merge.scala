package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE / upsert: apply a batch of changes to a snapshot in one pass —
  * the verb the reference's append-only warehouse loads lack (its job
  * bookmark appends every increment; `glue_rds_to_redshift.py:86-92`
  * re-loads the same dbtable, so corrected rows accumulate as
  * duplicates). `Merge.upsert` is the compaction that turns that
  * changelog-append model into current-state semantics:
  *
  *   - key in both and `deleteWhen`  -> row removed
  *   - key in both otherwise         -> source payload wins (update)
  *   - key only in source            -> inserted (unless `deleteWhen` —
  *                                      a delete for an absent key is a
  *                                      no-op, exactly like applying a
  *                                      CDC delete marker)
  *   - key only in target            -> kept unchanged
  *
  * Plan shape: ONE full-outer shuffle join on the key. Both sides
  * partition by the merge key and meet in place; no driver state, no
  * second pass. At 100 TB the target side dominates — if the target is
  * bucketed by the key (see [[graft.sources.Bucketing]]) its shuffle
  * disappears entirely and only the (small) change batch moves.
  */
object Merge {

  /** Merge `source` changes into `target`. Both frames must share the
    * schema `keys ++ payload`. Emits the merged state plus an `op`
    * column (`kept` / `updated` / `inserted`) so callers can audit the
    * decision per row.
    *
    * `deleteWhen` is evaluated against SOURCE columns (it marks a change
    * row as a delete instruction, the CDC convention) — pass e.g.
    * `col("event_type") === "delete"`.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             deleteWhen: Option[Column] = None): DataFrame = {
    val payload = target.columns.filterNot(keys.contains).toSeq
    require(source.columns.sorted.sameElements(target.columns.sorted),
      s"merge schema mismatch: ${source.columns.mkString(",")} vs ${target.columns.mkString(",")}")
    // presence tags survive the outer join where key columns null out
    val t = target.withColumn("_t", lit(1))
    val del = deleteWhen.getOrElse(lit(false))
    val s = source.withColumn("_s", lit(1))
      .withColumn("_del", coalesce(del, lit(false)))
    val joined = t.as("t").join(s.as("s"),
      keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "full_outer")
    val matched = col("t._t").isNotNull && col("s._s").isNotNull
    val sourceOnly = col("t._t").isNull
    joined
      // a source delete removes the matched row and no-ops when unmatched
      .where(!(col("s._s").isNotNull && col("s._del")))
      .select(
        keys.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k)) ++
          // when-otherwise, not coalesce: an update that sets a payload
          // column to NULL must win over the target's old value
          payload.map(c => when(col("s._s").isNotNull, col(s"s.$c"))
            .otherwise(col(s"t.$c")).as(c)) :+
          when(matched, lit("updated"))
            .when(sourceOnly, lit("inserted"))
            .otherwise(lit("kept")).as("op"): _*)
  }
}
