package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Sessionize
import graft.streaming.Streaming

class SessionizeSpec extends SparkSuite {

  test("batch sessionize equals the streaming session_window results exactly") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Tables.eventSeconds.as("tss"))
    val batch = Sessionize.batch(ev, 1800)
      .select("user_id", "session_start", "session_end", "n_events",
        "first_event", "last_event")
    val streamed = Streaming.runToCompletion(
      Streaming.userSessions(Streaming.events(spark, sf)), OutputMode.Complete())
      .select("user_id", "session_start", "session_end", "n_events",
        "first_event", "last_event")
    assert(batch.count() > 0)
    assert(batch.except(streamed).isEmpty && streamed.except(batch).isEmpty)
  }

  test("adjacent sessions merge at gap == gapSec, split strictly beyond") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 1800L),   // gap == 1800 -> same session
      (1L, 3L, 3601L),                  // gap 1801 -> new session
      (2L, 4L, 100L)
    ).toDF("user_id", "event_id", "tss")
    val got = Sessionize.batch(ev, 1800)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 3600L, 2L), (1L, 3601L, 5401L, 1L), (2L, 100L, 1900L, 1L)))
  }

  test("one shuffle serves windows and aggregation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Tables.eventSeconds.as("tss"))
    val plan = Sessionize.batch(ev, 1800).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one hash exchange, plan:\n$plan")
  }
}
