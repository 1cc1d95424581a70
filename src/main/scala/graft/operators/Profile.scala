package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row count, null count,
  * exact distinct count, min/max, and mean, melted to one row per column.
  *
  * Plan shape (r9 verdict #2): the non-distinct stats fold into ONE
  * codegen'd hash-aggregate pass, and each exact ndv runs as its OWN
  * single-distinct hash aggregate — |cols| extra scans that each read one
  * column of a column-pruned parquet. The naive alternative — all
  * `countDistinct`s in one aggregate — makes Catalyst's distinct rewrite
  * Expand the input |cols|+1 ways and carry every accumulator through
  * ObjectHashAggregate passes: a 5x scan blow-up materialized as shuffle
  * rows, which is the scale-killer at 100 TB (measured 12.5 s vs 2.4 s at
  * sf0.1; same pathology fixed for approx_sketches in r4, 4.2 s -> 0.6 s).
  * Separate pruned single-column scans are also how a real profiler runs
  * column-parallel on a cluster. All |cols|+1 results are 1-row frames, so
  * the recombining cross joins are metadata-sized; the melt is a map-only
  * `stack` over the single 1-row result.
  */
object Profile {

  /** Profile the given numeric columns of `df`. Min/max/avg are emitted
    * as doubles so every column melts into one uniform long-form schema.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val baseAggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    // melt the base pass to long form FIRST, then recombine with the ndv
    // rows by an equi-join on column_name — a real (non-constant-folding)
    // key, so the |cols|-row recombination plans as a broadcast HASH join
    // and the global plan sweep's no-nested-loop invariant holds with
    // zero allowlist entries (both a crossJoin and a literal-key join of
    // the 1-row frames constant-fold into BroadcastNestedLoopJoin)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__min`, `${c}__max`, `${c}__avg`")
      .mkString(", ")
    val base = df.agg(baseAggs.head, baseAggs.tail: _*).selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n, n_nulls, min_val, max_val, avg_val)")
    // one single-distinct aggregate per column: plans as two plain hash
    // aggregates over the pruned column — no Expand, stays in codegen
    val ndvs = cols.map(c =>
      df.agg(countDistinct(col(c)).as("ndv"))
        .select(lit(c).as("column_name"), col("ndv")))
      .reduce(_ unionByName _)
    base.join(ndvs, Seq("column_name"))
      .select(col("column_name"), col("n"), col("n_nulls"), col("ndv"),
        col("min_val"), col("max_val"), col("avg_val"))
  }

  /** k-anonymity risk report — the privacy gate a dataset release (or a
    * training-data drop containing user-derived rows) runs over its
    * quasi-identifier columns: every QI combination shared by FEWER than
    * `k` rows re-identifies its members by linkage, so those equivalence
    * classes are the risk set. Emits one row per risky class with its
    * size and the share of the table it puts at risk.
    *
    * One map-side-combined aggregation on the QI key (the shuffle
    * carries distinct QI combinations, never rows), pinned so the
    * total-row count comes from a classes-sized re-aggregation shared
    * with the risky-class filter — not a second scan of the input, and
    * NOT a single-partition window over the classes frame (the
    * batch_padding anti-pattern: QI cardinality can approach row count).
    * The total rides IN the plan as a broadcast one-row cross join — no
    * eager action at construction time, so the frame stays a lazy pure
    * function of its input (a re-execution against changed input can
    * never divide by a stale denominator). Output is |risky classes|
    * rows, the thing an auditor reads.
    */
  def kAnonymityRisk(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(k >= 2 && quasiIds.nonEmpty)
    val byClass = graft.Residue.pin(df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size")))
    val total = byClass
      .agg(coalesce(sum(col("class_size")), lit(1L)).as("_total"))
    byClass
      .filter(col("class_size") < k)
      .crossJoin(broadcast(total))
      .select(quasiIds.map(col) :+ col("class_size") :+
        round(col("class_size").cast("double") / col("_total"), 6)
          .as("risk_share"): _*)
  }
}
