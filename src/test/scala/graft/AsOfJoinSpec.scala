package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("as-of semantics: latest right <= left ts per key, inclusive, left-outer") {
    val left = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"), (2L, 7L, "e4"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 100L, "c"))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "ts", Seq("v"), "r_")
      .select("k", "ts", "name", "r_v").as[(Long, Long, String, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 5L, "e1", None),          // before first right row
      (1L, 10L, "e2", Some("a")),    // equal ts matches (<= semantics)
      (1L, 20L, "e3", Some("b")),
      (2L, 7L, "e4", None)))         // right row is later -> no match
  }

  test("as-of join plans exactly one shuffle on the key") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Tables.eventMicros.as("ts"))
    val signups = ev.filter(col("event_type") === "signup")
    val plan = AsOfJoin.asOf(ev, signups, "user_id", "ts", "ts", Seq("event_id"), "s_")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, plan)
  }

  test("as-of over events matches a per-user scan check") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Tables.eventMicros.as("ts"))
    val signups = ev.filter(col("event_type") === "signup")
    val got = AsOfJoin.asOf(ev, signups, "user_id", "ts", "ts", Seq("event_id"), "s_")
      .select("event_id", "user_id", "ts", "s_event_id")
      .as[(Long, Long, Long, Option[Long])].collect()
    val byUser = ev.select("event_id", "user_id", "ts", "event_type")
      .as[(Long, Long, Long, String)].collect().groupBy(_._2)
    got.foreach { case (eid, uid, ts, sid) =>
      val expected = byUser(uid).filter(e => e._4 == "signup" && e._3 <= ts)
        .sortBy(_._3).lastOption.map(_._1)
      assert(sid == expected, s"event $eid")
    }
  }
}
