package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row whose
  * timestamp is <= the left row's, per join key. Spark has no native as-of
  * operator; this composes one from a union-tag + running `last(ignoreNulls)`
  * window:
  *
  *   1. tag left rows side=1, right rows side=0, align schemas by name
  *      (right payload columns carried prefixed; each side's missing
  *      columns become nulls)
  *   2. one shuffle: partition by key, sort by (ts, side) — a right row at
  *      the same timestamp as a left row sorts first, giving <= semantics
  *   3. running last(payload, ignoreNulls) assigns every left row the
  *      latest preceding right payload; keep side=1 rows
  *
  * Scale: exactly one shuffle of |left| + |right| rows on the join key and
  * a per-partition sort — no range cross-join, no per-row right-side scan.
  * This is the canonical distributed as-of at 100 TB (both sides stream
  * through the sort; state is one payload row per key).
  *
  * Contract: right (key, ts) pairs should be unique (ties among right rows
  * at identical timestamps are broken arbitrarily), and payload columns
  * must be non-null (a null payload value would be skipped past by
  * ignoreNulls). Left rows before the first right row get null payloads
  * (left-outer semantics).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String],
           prefix: String): DataFrame = {
    val lTag = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val rTag = right.select(
      col(key) +: col(rightTs).as("__ts") +: payload.map(p => col(p).as(prefix + p)): _*)
      .withColumn("__side", lit(0))
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(prefix + p, last(col(prefix + p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
