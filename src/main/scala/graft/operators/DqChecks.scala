package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the schema/content contract a pipeline
  * asserts before publishing a table (or feeding a training run).
  *
  * Three check families, compiled into the minimum number of passes:
  *  - row checks (not-null, range, accepted-values, any boolean
  *    violation predicate) — ALL of them fold into ONE aggregation over
  *    one scan, partially aggregated before the single exchange;
  *  - uniqueness — count vs distinct-count folded into the SAME
  *    aggregation (Catalyst plans the distincts as one Expand over the
  *    same scan, not extra scans);
  *  - referential integrity — one left-anti join per foreign key against
  *    its dimension (broadcast when the dimension is small; at 100 TB a
  *    large dimension shuffles on the key like any join, never a scan
  *    per constraint).
  *
  * Output: one row per check `(check_name, column_name, violations,
  * passed)` — violations is a count, so the gate is `forall passed` and
  * the per-check magnitude survives for triage.
  */
object DqChecks {

  /** A named row-level constraint: `violation` is a boolean column that
    * is true on rows BREAKING the constraint.
    */
  final case class RowCheck(name: String, column: String, violation: Column)

  /** A foreign-key constraint: every non-null `factKey` must exist in
    * `dim(dimKey)`.
    */
  final case class FkCheck(name: String, factKey: String, dim: DataFrame,
                           dimKey: String)

  def checks(df: DataFrame, rowChecks: Seq[RowCheck],
             uniqueCols: Seq[String] = Nil,
             fks: Seq[FkCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueCols.nonEmpty || fks.nonEmpty)
    val spark = df.sparkSession

    val fused: Option[DataFrame] =
      if (rowChecks.isEmpty && uniqueCols.isEmpty) None
      else {
        val rowAggs = rowChecks.zipWithIndex.map { case (c, i) =>
          // coalesce: sum over an EMPTY table is null, and an empty table
          // violates nothing
          coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(s"_rc$i")
        }
        val uniqAggs = uniqueCols.zipWithIndex.flatMap { case (c, i) =>
          Seq(count(col(c)).as(s"_un$i"), countDistinct(col(c)).as(s"_ud$i"))
        }
        val aggs = rowAggs ++ uniqAggs
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = (rowChecks.zipWithIndex.map { case (c, i) =>
          s"'${c.name}', '${c.column}', CAST(`_rc$i` AS BIGINT)"
        } ++ uniqueCols.zipWithIndex.map { case (c, i) =>
          s"'unique', '$c', CAST(`_un$i` - `_ud$i` AS BIGINT)"
        }).mkString(", ")
        val k = rowChecks.size + uniqueCols.size
        Some(one.selectExpr(
          s"stack($k, $stackArgs) AS (check_name, column_name, violations)"))
      }

    val fkFrames = fks.map { fk =>
      // orphan fact keys = anti-join against the dimension; Catalyst/AQE
      // broadcasts a small dimension, shuffles on the key otherwise
      df.select(col(fk.factKey)).where(col(fk.factKey).isNotNull)
        .join(fk.dim.select(col(fk.dimKey)),
          col(fk.factKey) === col(fk.dimKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(fk.name).as("check_name"),
          lit(fk.factKey).as("column_name"),
          col("violations").cast("long").as("violations"))
    }

    (fused.toSeq ++ fkFrames)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
  }
}
