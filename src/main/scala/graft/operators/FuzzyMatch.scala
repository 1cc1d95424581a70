package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching: approximate string joins without a
  * cross join. Candidate pairs must share a cheap blocking key (name
  * prefix); only candidates pay the O(len²) edit-distance verification.
  *
  * Plan shape: one equi-join shuffle on the blocking key; the
  * `levenshtein` verify is a map-side post-filter on matched candidates.
  * At 100 TB the join fan-out is governed by blocking-key selectivity —
  * the same max-df discipline as shingle dedup ([[Dedup]]); widen
  * `prefixLen` (or add a second blocking pass on e.g. suffix) rather
  * than falling back to the quadratic all-pairs compare.
  *
  * A fixed-prefix block means edits inside the first `prefixLen`
  * characters are not recalled — the standard single-pass blocking
  * trade-off; production recall stacks a handful of passes with
  * different keys and unions the candidates.
  */
object FuzzyMatch {

  private def blockKey(c: Column, prefixLen: Int): Column =
    substring(c, 1, prefixLen)

  /** Match `left` names to `right` names: share a `prefixLen`-char
    * prefix AND levenshtein distance ≤ `maxDist`. Self-pairs (same id)
    * are dropped so a frame can be matched against itself.
    */
  def blocked(left: DataFrame, right: DataFrame, idCol: String,
              nameCol: String, prefixLen: Int, maxDist: Int): DataFrame = {
    val l = left.select(col(idCol).as("id_a"), col(nameCol).as("name_a"))
      .withColumn("_bk", blockKey(col("name_a"), prefixLen))
    val r = right.select(col(idCol).as("id_b"), col(nameCol).as("name_b"))
      .withColumn("_bk", blockKey(col("name_b"), prefixLen))
    l.join(r, "_bk")
      .where(col("id_a") =!= col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .drop("_bk")
  }
}
