package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe HOLISTIC aggregation. Algebraic aggregates (sum/count/
  * min/max) never need salting — partial aggregation already hands the
  * hot key's reducer one row per map task. The aggregates that melt a
  * reducer are the holistic ones, where per-key state is value-set-sized
  * (exact distinct counts, collect_list, exact percentiles): every
  * occurrence of the hot key lands on one task. [[SkewJoin]] is the join
  * face of this problem; this is the aggregation face.
  */
object SkewAgg {

  /** Exact per-key distinct count with the distinct set sharded `salts`
    * ways. The shard key is a pure function OF THE DISTINCT COLUMN, so
    * equal values always land in the same shard and the per-shard
    * distinct sets are disjoint — phase 2 can plain-sum them. The
    * hottest key's per-task state shrinks from |distinct values| to
    * |distinct values| / salts, at the cost of one extra (tiny,
    * key × salts-sized) shuffle. Result is exactly equal to
    * `countDistinct`, spec-pinned.
    */
  def distinctCountSalted(df: DataFrame, keyCols: Seq[String],
                          distinctCol: String, salts: Int): DataFrame = {
    require(salts >= 2, "salts must be >= 2")
    val shard = pmod(hash(col(distinctCol)), lit(salts)).as("_salt")
    df.groupBy(keyCols.map(col) :+ shard: _*)
      .agg(countDistinct(col(distinctCol)).as("_part"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_part")).as("n_distinct"))
  }
}
