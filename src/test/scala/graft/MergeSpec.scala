package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("id", "name", "value")

  private def source = Seq(
    (2L, "b2", 21.0),   // update
    (3L, "DEL", 0.0),   // delete marker for an existing key
    (5L, "e", 50.0),    // insert
    (6L, "DEL", 0.0)    // delete for an absent key: no-op
  ).toDF("id", "name", "value")

  test("upsert applies update/delete/insert and keeps untouched rows") {
    val out = Merge.upsert(target, source, Seq("id"),
        deleteWhen = Some(col("name") === "DEL"))
      .orderBy("id")
      .as[(Long, String, Double, String)].collect().toList
    assert(out === List(
      (1L, "a", 10.0, "kept"),
      (2L, "b2", 21.0, "updated"),
      (4L, "d", 40.0, "kept"),
      (5L, "e", 50.0, "inserted")))
  }

  test("an update that nulls a payload column wins over the old value") {
    val src = Seq((2L, Option.empty[String], 21.0)).toDF("id", "name", "value")
    val out = Merge.upsert(target, src, Seq("id"))
      .where(col("id") === 2L)
      .select(col("name"), col("value"), col("op"))
      .collect().head
    assert(out.isNullAt(0) && out.getDouble(1) == 21.0 && out.getString(2) == "updated")
  }

  test("merge plans a single-join shuffle, never a nested loop") {
    val plan = Merge.upsert(target, source, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("FullOuter"), plan)
  }

  test("merge with no deletes is target ∪ source with source winning") {
    val out = Merge.upsert(target, source, Seq("id")).orderBy("id")
      .select(col("id"), col("name")).as[(Long, String)].collect().toList
    assert(out === List((1L, "a"), (2L, "b2"), (3L, "DEL"), (4L, "d"),
      (5L, "e"), (6L, "DEL")))
  }
}
