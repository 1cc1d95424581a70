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

  test("scd2Merge over a ts-split changelog is row-identical to batch recompute") {
    val all = changelog.select("user_id", "tss", "event_id", "event_type")
    val r = all.agg(min(col("tss")), max(col("tss"))).head()
    val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 9 / 10
    val dim = Cdc.scd2(all.filter(col("tss") <= cut), Seq("user_id"),
      "tss", "event_id", Seq("event_type"), keepTie = true)
    val merged = Cdc.scd2Merge(dim, all.filter(col("tss") > cut),
      Seq("user_id"), "tss", "event_id", Seq("event_type"))
    val batch = Cdc.scd2(all, Seq("user_id"), "tss", "event_id", Seq("event_type"))
    assert(merged.count() == batch.count())
    assert(merged.except(batch).isEmpty && batch.except(merged).isEmpty)
  }

  test("scd2Merge: pure redelivery of the open state leaves the dimension bit-identical") {
    val old = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
      (2L, 10L, 102L, "x")
    ).toDF("k", "tss", "id", "attr")
    val dim = Cdc.scd2(old, Seq("k"), "tss", "id", Seq("attr"), keepTie = true)
    // delta redelivers each key's current state at a later ts
    val delta = Seq((1L, 30L, 103L, "b"), (2L, 30L, 104L, "x"))
      .toDF("k", "tss", "id", "attr")
    val got = Cdc.scd2Merge(dim, delta, Seq("k"), "tss", "id", Seq("attr"))
    val want = dim.drop("_tie")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("scd2Merge: the stored dimension side is map-only broadcast semi/anti, never shuffle-joined") {
    val all = changelog.select("user_id", "tss", "event_id", "event_type")
    val r = all.agg(min(col("tss")), max(col("tss"))).head()
    val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 9 / 10
    // write + re-read so the dim side is a real stored table, not a
    // reused in-session plan
    val dir = s"${graft.TempDirs.create("scd2dim")}/dim"
    Cdc.scd2(all.filter(col("tss") <= cut), Seq("user_id"),
      "tss", "event_id", Seq("event_type"), keepTie = true)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val merged = Cdc.scd2Merge(stored, all.filter(col("tss") > cut),
      Seq("user_id"), "tss", "event_id", Seq("event_type"))
    val plan = merged.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 2,
      s"dim side must meet the touched-key set in broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"dimension history must never be shuffle-joined:\n$plan")
    // and the merge agrees with batch recompute over the stored round-trip
    val batch = Cdc.scd2(all, Seq("user_id"), "tss", "event_id", Seq("event_type"))
    assert(merged.except(batch).isEmpty && batch.except(merged).isEmpty)
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
