package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row count, null count,
  * exact distinct count, min/max, and mean in ONE pass over the table,
  * melted to one row per column.
  *
  * The multi-column distinct counts plan as a single aggregate over a
  * Catalyst Expand (one input scan fanned to |cols| streams), partially
  * aggregated before the exchange — the optimizer-maintained statistics
  * a catalog needs (SURVEY.md §1.1) without |cols| separate scans. The
  * melt is a map-only `stack` over the single 1-row aggregate result.
  */
object Profile {

  /** Profile the given numeric columns of `df`. Min/max/avg are emitted
    * as doubles so every column melts into one uniform long-form schema.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__ndv`, `${c}__min`, `${c}__max`, `${c}__avg`")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n, n_nulls, ndv, min_val, max_val, avg_val)")
  }
}
