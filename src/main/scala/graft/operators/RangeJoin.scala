package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (point-in-range) join at scale.
  *
  * Spark plans a raw non-equi condition `p.sec BETWEEN r.start AND r.end`
  * as a BroadcastNestedLoopJoin — O(|points| * |ranges|) compares, and a
  * hard failure once the ranges side outgrows the broadcast limit. The
  * scale formulation bins time into fixed `binWidth` buckets: a point
  * lives in exactly ONE bin, a range of bounded width covers a handful of
  * bins (exploded with `sequence`), and the join becomes an equi-join on
  * the bin key — one hash shuffle on each side — followed by the exact
  * containment post-filter. Because the point's single bin is necessarily
  * among the range's covered bins, every matching (point, range) pair
  * meets exactly once: no distinct, no dedup, at any scale.
  *
  * `binWidth` is the tuning knob: ~the typical range width keeps the
  * explode factor at ~2 while keeping bins selective.
  */
object RangeJoin {

  /** Join rows of `points` to every row of `ranges` whose
    * `[startSec, endSec]` interval contains `pointSec` (inclusive both
    * ends, integer seconds). Returns all columns of both inputs.
    */
  def binned(points: DataFrame, pointSec: String,
             ranges: DataFrame, startSec: String, endSec: String,
             binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(pointSec) / binWidth).cast("long"))
    val r = ranges.withColumn("_bin",
      explode(sequence(
        floor(col(startSec) / binWidth).cast("long"),
        floor(col(endSec) / binWidth).cast("long"))))
    p.join(r, Seq("_bin"))
      .where(col(pointSec) >= col(startSec) && col(pointSec) <= col(endSec))
      .drop("_bin")
  }

  /** Reference semantics for specs: the naive non-equi join (plans a
    * nested loop — correct on small inputs, never the scale path).
    */
  def naive(points: DataFrame, pointSec: String,
            ranges: DataFrame, startSec: String, endSec: String): DataFrame =
    points.join(ranges,
      col(pointSec) >= col(startSec) && col(pointSec) <= col(endSec))
}
