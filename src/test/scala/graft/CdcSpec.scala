package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Cdc

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def changelog = Tables.events(spark, sf)
    .select(col("user_id"), Tables.eventSeconds.as("tss"),
      col("event_id"), col("event_type"), col("value"))

  test("latest equals the row_number window formulation") {
    val got = Cdc.latest(changelog, Seq("user_id"), Seq("tss", "event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("tss").desc, col("event_id").desc)
    val want = changelog.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("delete markers drop a key only when the delete is the latest change") {
    val ch = Seq(
      (1L, 10L, 100L, "U"), (1L, 20L, 101L, "D"),              // delete wins
      (2L, 10L, 102L, "D"), (2L, 20L, 103L, "U"),              // reinserted
      (3L, 10L, 104L, "U")
    ).toDF("k", "tss", "id", "op")
    val got = Cdc.latest(ch, Seq("k"), Seq("tss", "id"),
        isDelete = Some(col("op") === "D"))
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 103L), (3L, 104L)))
  }

  test("a NULL delete marker means not-deleted, never a silent drop") {
    val ch = Seq(
      (1L, 10L, 100L, Option("U")), (1L, 20L, 101L, Option.empty[String]),
      (2L, 10L, 102L, Option("D"))
    ).toDF("k", "tss", "id", "op")
    val got = Cdc.latest(ch, Seq("k"), Seq("tss", "id"),
        isDelete = Some(col("op") === "D"))
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 101L)), "the NULL-marker winner must survive")
  }

  test("latest partial-aggregates before its single exchange, with no window") {
    val plan = Cdc.latest(changelog, Seq("user_id"), Seq("tss", "event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    // struct max -> SortAggregate; the map-side combine is the point:
    // the shuffle carries <=1 row per key per partition, not the log
    assert(plan.contains("partial_max"), s"no map-side combine, plan:\n$plan")
    assert("SortAggregate".r.findAllIn(plan).length == 2,
      s"expected partial+final aggregate, plan:\n$plan")
  }

  test("scd2 collapses redelivered states and closes intervals at the next change") {
    val ch = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "a"),   // redelivery: same state
      (1L, 30L, 102L, "b"), (1L, 40L, 103L, "a"),   // back to a: new version
      (2L, 10L, 104L, "x")
    ).toDF("k", "tss", "id", "attr")
    val got = Cdc.scd2(ch, Seq("k"), "tss", "id", Seq("attr"))
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, Some(30L), 0L),
      (1L, "b", 30L, Some(40L), 0L),
      (1L, "a", 40L, None, 1L),
      (2L, "x", 10L, None, 1L)))
  }

  test("scd2 intervals tile each key's timeline: one open row per key, no overlap") {
    val dim = Cdc.scd2(changelog, Seq("user_id"), "tss", "event_id", Seq("event_type"))
    val opens = dim.groupBy("user_id").agg(sum("is_current").as("n_open"))
      .where(col("n_open") =!= 1).count()
    assert(opens == 0, "every key must have exactly one current row")
    // each closed row's valid_to equals the next row's valid_from
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val gaps = dim.withColumn("_next", lead(col("valid_from"), 1).over(w))
      .where(col("_next").isNotNull && col("valid_to") =!= col("_next")).count()
    assert(gaps == 0, "validity intervals must tile without gaps or overlap")
  }

  test("scd2 is one shuffle on the key") {
    val plan = Cdc.scd2(changelog, Seq("user_id"), "tss", "event_id", Seq("event_type"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
