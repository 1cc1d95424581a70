package graft

import org.apache.spark.sql.functions._
import graft.operators.Patterns

class PatternsSpec extends SparkSuite {
  import spark.implicits._

  private def trace(rows: (Long, Long, String, Long)*) =
    rows.toDF("user_id", "event_id", "event_type", "tss")

  test("tightest-chain sequence matching on a hand-built trace") {
    val ev = trace(
      // user 1: two completing purchases off the same click->view chain
      (1L, 1L, "click", 0L), (1L, 2L, "view", 10L),
      (1L, 3L, "purchase", 20L), (1L, 4L, "purchase", 50L),
      // user 2: no click -> never matches
      (2L, 5L, "view", 0L), (2L, 6L, "purchase", 10L),
      // user 3: only chain spans 5100 > 3600 -> no match
      (3L, 7L, "click", 0L), (3L, 8L, "view", 5000L),
      (3L, 9L, "purchase", 5100L),
      // user 4: early click would blow the window; the TIGHTEST chain
      // (click@3000) fits -> exists-semantics holds
      (4L, 10L, "click", 0L), (4L, 11L, "click", 3000L),
      (4L, 12L, "view", 3100L), (4L, 13L, "purchase", 3200L))
    val got = Patterns.sequenceMatches(ev,
        Seq("click", "view", "purchase"), withinSec = 3600)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 20L, 20L),   // 2 matches; first ends at 20 with span 20
      (4L, 1L, 3200L, 200L) // span from the later click, not the first
    ))
  }

  test("pattern order is strict: reversed events never match") {
    val ev = trace((1L, 1L, "purchase", 0L), (1L, 2L, "view", 10L),
      (1L, 3L, "click", 20L))
    assert(Patterns.sequenceMatches(ev,
      Seq("click", "view", "purchase"), 3600).count() == 0)
  }

  test("custom input column names resolve (windows built over canonical names)") {
    val ev = trace((1L, 1L, "click", 0L), (1L, 2L, "view", 10L),
        (1L, 3L, "purchase", 20L))
      .toDF("uid", "eid", "etype", "sec")
    val got = Patterns.sequenceMatches(ev, Seq("click", "view", "purchase"),
        withinSec = 3600, user = col("uid"), tsSec = col("sec"),
        id = col("eid"), typ = col("etype"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 20L, 20L)))
  }

  test("whole pattern plans as one exchange (as-of-join shape)") {
    val ev = trace((1L, 1L, "click", 0L), (1L, 2L, "view", 1L),
      (1L, 3L, "purchase", 2L))
    val plan = Patterns.sequenceMatches(ev,
      Seq("click", "view", "purchase"), 3600).queryExecution.executedPlan
    val exchanges = plan.toString.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, plan.toString)
  }
}
