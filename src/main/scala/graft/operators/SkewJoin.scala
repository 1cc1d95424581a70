package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to one task; at
  * 100 TB a single hot key stalls the stage (AQE's skew-join split handles
  * sort-merge cases, but salting is the general, planner-independent fix
  * and composes with any join type). Here:
  *
  *   - the big side gets a deterministic salt in [0, buckets) derived from
  *     a caller-chosen expression (NOT rand(): retries/speculative tasks
  *     must salt identically);
  *   - the small side is replicated once per bucket (explode of a
  *     `buckets`-element array — small × buckets stays small);
  *   - the equi-join runs on (key, salt), spreading each hot key over
  *     `buckets` tasks.
  *
  * Result set is identical to the unsalted join (spec-asserted).
  */
object SkewJoin {

  def salted(big: DataFrame, small: DataFrame, key: String,
             buckets: Int, bigSalt: Column): DataFrame = {
    val b = big.withColumn("__salt", pmod(bigSalt, lit(buckets)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
