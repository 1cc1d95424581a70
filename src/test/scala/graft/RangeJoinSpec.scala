package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join vs the naive nested-loop formulation. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 100L), (2L, 150L), (3L, 200L), (4L, 350L), (5L, 999L)
  ).toDF("pid", "sec")
  // ranges crossing bin boundaries (binWidth 100 below), touching ends,
  // and one empty
  private lazy val ranges = Seq(
    (10L, 90L, 160L),   // contains 100, 150 (spans bins 0-1)
    (11L, 200L, 200L),  // degenerate single-second range: contains 200
    (12L, 300L, 400L),  // contains 350
    (13L, 500L, 600L)   // empty
  ).toDF("rid", "start_sec", "end_sec")

  test("binned equals naive, inclusive on both ends") {
    val binned = RangeJoin.binned(points, "sec", ranges, "start_sec", "end_sec", 100)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val naive = RangeJoin.naive(points, "sec", ranges, "start_sec", "end_sec")
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(binned == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
  }

  test("each matching pair meets exactly once (point's bin is unique)") {
    // a range spanning many bins must still produce one row per match
    val wide = Seq((20L, 0L, 1000L)).toDF("rid", "start_sec", "end_sec")
    val got = RangeJoin.binned(points, "sec", wide, "start_sec", "end_sec", 100)
      .select("pid", "rid").as[(Long, Long)].collect()
    assert(got.length == got.distinct.length)
    assert(got.length == 5)
  }

  test("binned plans an equi-join, never a nested loop; naive does nested-loop") {
    val binnedPlan = RangeJoin.binned(points, "sec", ranges, "start_sec", "end_sec", 100)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"),
      "scale path must not plan a nested-loop join")
    val naivePlan = RangeJoin.naive(points, "sec", ranges, "start_sec", "end_sec")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
  }

  test("binWidth does not change results") {
    val r1 = RangeJoin.binned(points, "sec", ranges, "start_sec", "end_sec", 7)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val r2 = RangeJoin.binned(points, "sec", ranges, "start_sec", "end_sec", 1000)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(r1 == r2)
  }
}
