package graft

import org.apache.spark.sql.functions._
import graft.operators.HybridSearch

/** RRF fusion semantics: rank-only contributions, null-safe single-arm
  * docs, deterministic tie-breaks, and the declared-query composition
  * over the real arms.
  */
class HybridSearchSpec extends SparkSuite {
  import spark.implicits._

  test("rankArm ranks by score desc with doc_id tie-break") {
    val arm = Seq((7L, 2.0), (3L, 5.0), (9L, 2.0)).toDF("doc_id", "score")
    val got = HybridSearch.rankArm(arm, col("score"), "r")
      .as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got === Seq((3L, 1), (7L, 2), (9L, 3)))
  }

  test("rrf2 fuses both-arm docs, keeps single-arm docs with a null rank") {
    val text = Seq((1L, 1), (2L, 2)).toDF("doc_id", "r_text")
    val vec = Seq((2L, 1), (5L, 2)).toDF("doc_id", "r_vec")
    val got = HybridSearch.rrf2(text, vec, k = 10)
      .select(col("doc_id"), col("r_text"), col("r_vec"), col("rrf"))
      .as[(Long, Option[Int], Option[Int], Double)].collect().toSeq
    def c(r: Int) = 1.0 / (60 + r)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2 is in both arms and must outrank either single-arm doc
    assert(got.map(t => (t._1, t._4)) === Seq(
      (2L, r6(c(2) + c(1))), (1L, r6(c(1))), (5L, r6(c(2)))))
    assert(got.find(_._1 == 1L).get._3.isEmpty) // absent vector arm
    assert(got.find(_._1 == 5L).get._2.isEmpty) // absent text arm
  }

  test("the declared query returns k fused rows led by both-arm docs") {
    val out = SparkEntry.queries("hybrid_search_rrf")(spark, sf)
      .as[(Long, Option[Int], Option[Int], Double)].collect().toSeq
    assert(out.size === 20)
    // descending rrf with doc_id tie-break — the paging contract
    val pairs = out.map(t => (-t._4, t._1))
    assert(pairs === pairs.sorted)
    // every row carries at least one arm rank
    assert(out.forall(t => t._2.nonEmpty || t._3.nonEmpty))
  }
}
