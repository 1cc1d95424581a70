package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table diff by key — "what changed between two snapshots": rows only in
  * the new version (`added`), only in the old (`removed`), or present in
  * both with any differing payload column (`changed`). Unchanged rows
  * are dropped, so the output is change-sized, not table-sized.
  *
  * The regression harness for every pipeline migration: rewrite a job,
  * diff old vs new output, review a handful of rows instead of eyeballing
  * 100 TB. Plan shape: ONE full-outer shuffle join on the key (bucketed
  * snapshots make it shuffle-free); payload comparison is a map-side
  * null-safe column equality, no second pass.
  */
object Diff {

  /** Both frames must share the schema `keys ++ payload`. Emits one row
    * per differing key: the key columns plus `op`
    * (`added` / `removed` / `changed`).
    */
  def byKey(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    require(left.columns.sorted.sameElements(right.columns.sorted),
      s"diff schema mismatch: ${left.columns.mkString(",")} vs ${right.columns.mkString(",")}")
    val payload = left.columns.filterNot(keys.contains).toSeq
    val l = left.withColumn("_l", lit(1)).as("l")
    val r = right.withColumn("_r", lit(1)).as("r")
    val differs = payload.map(c => !(col(s"l.$c") <=> col(s"r.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("l._l").isNull, lit("added"))
      .when(col("r._r").isNull, lit("removed"))
      .when(differs, lit("changed"))
    l.join(r, keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _), "full_outer")
      .withColumn("op", op)
      .where(col("op").isNotNull)
      .select(keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) :+ col("op"): _*)
  }
}
