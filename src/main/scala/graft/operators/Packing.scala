package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard packing: assign each document to a fixed token-budget
  * shard, in id order — the last mile of a training-data pipeline
  * ("shard the cleaned corpus into ~4M-token files").
  *
  * The naive formulation is a running token total over the WHOLE corpus
  * — `Window.orderBy(id)` with no partition key, i.e. an Exchange
  * SinglePartition that funnels 100 TB through one task. This operator
  * is the textbook two-level prefix sum instead:
  *
  *  1. rows get a deterministic range id from FIXED-WIDTH id ranges
  *     (`repartitionByRange` is not used: its sampling seed varies run
  *     to run, and shard assignment must be replayable);
  *  2. one small aggregation computes per-range token sums; the driver
  *     folds them into per-range offsets — O(ranges) metadata, like a
  *     bookmark commit;
  *  3. each range computes its LOCAL exclusive running sum in parallel
  *     (window partitioned by range id) and adds its offset literal.
  *
  * shard_id = (offset + local exclusive prefix) div budget — exact
  * integer arithmetic, bit-identical to the single-window formulation
  * (spec-pinned) and to the SQL oracle.
  */
object Packing {

  def tokenShards(docs: DataFrame, idCol: String, nTokCol: String,
                  budget: Long, ranges: Int = 32): DataFrame = {
    require(budget >= 1 && ranges >= 1)
    val bounds = docs.agg(min(col(idCol)).as("lo"), max(col(idCol)).as("hi")).head()
    if (bounds.isNullAt(0)) return docs.withColumn("shard_id", lit(0L))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val width = math.max(1L, (hi - lo) / ranges + 1)

    val withRange = docs.withColumn("_rid", expr(s"($idCol - $lo) DIV $width"))
    // O(ranges) driver metadata: per-range sums -> exclusive offsets
    val sums = withRange.groupBy(col("_rid")).agg(sum(col(nTokCol)).as("_s"))
      .orderBy(col("_rid")).collect()
    var acc = 0L
    val offsets: Map[Long, Long] = sums.map { r =>
      val entry = r.getLong(0) -> acc
      acc += r.getLong(1)
      entry
    }.toMap

    val w = Window.partitionBy(col("_rid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withRange
      .withColumn("_off", element_at(typedlit(offsets), col("_rid")))
      .withColumn("_pre", coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"(_off + _pre) DIV $budget"))
      .drop("_rid", "_off", "_pre")
  }
}
