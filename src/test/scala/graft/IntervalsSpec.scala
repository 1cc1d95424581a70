package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  test("overlapping and touching intervals coalesce; gaps split") {
    val iv = Seq(
      ("u1", 0L, 10L), ("u1", 5L, 12L),   // overlap -> one span
      ("u1", 12L, 15L),                   // touching -> merges in
      ("u1", 20L, 25L),                   // gap -> new span
      ("u2", 0L, 1L)                      // other key untouched
    ).toDF("k", "s", "e")
    val out = Intervals.coalesce(iv, "k", "s", "e")
      .orderBy("k", "s").as[(String, Long, Long, Long)].collect().toList
    assert(out === List(
      ("u1", 0L, 15L, 3L), ("u1", 20L, 25L, 1L), ("u2", 0L, 1L, 1L)))
  }

  test("an interval nested inside an earlier one does not reopen the span") {
    // running max of end (not lag) is what makes [0,100],[1,2],[3,4] one span
    val iv = Seq(("u", 0L, 100L), ("u", 1L, 2L), ("u", 3L, 4L))
      .toDF("k", "s", "e")
    val out = Intervals.coalesce(iv, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().toList
    assert(out === List(("u", 0L, 100L, 3L)))
  }

  test("coalesce shuffles once on the key") {
    val iv = Seq(("u", 0L, 1L)).toDF("k", "s", "e")
    val plan = Intervals.coalesce(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
