package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other
  * row, maximizing both dimensions — "best cost/quality trade-offs",
  * with domination = ≥ in both dims and > in at least one.
  *
  * The textbook formulation is a quadratic NOT-EXISTS self-join (the
  * oracle uses exactly that); the sort identity makes it linear after a
  * sort: scanning distinct points by (x desc, y desc), a point is
  * dominated iff the running max of y over strictly-preceding points
  * is ≥ its y. Distributed shape: a partition-local frontier pass first
  * (dominated points can be discarded wherever they are — the global
  * frontier is a subset of every local one), then the exact pass runs
  * over the few survivors; the only single-partition sort in the plan
  * sees frontier-sized data, never the input. Equal (x, y) points tie
  * (neither dominates), so the frontier is computed on distinct points
  * and rows rejoin it by semi-join.
  */
object Skyline {

  private def frontierPass(in: DataFrame, yCol: String, w: WindowSpec): DataFrame =
    in.withColumn("_pm",
        max(col(yCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .where(col("_pm").isNull || col("_pm") < col(yCol))
      .drop("_pm")

  def pareto2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(xCol), col(yCol)).distinct()
    val local = frontierPass(pts, yCol,
      Window.partitionBy(spark_partition_id())
        .orderBy(col(xCol).desc, col(yCol).desc))
    val frontier = frontierPass(local, yCol,
      Window.orderBy(col(xCol).desc, col(yCol).desc))
    df.join(frontier, Seq(xCol, yCol), "left_semi")
  }
}
