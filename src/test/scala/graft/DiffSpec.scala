package graft

import graft.operators.Diff

class DiffSpec extends SparkSuite {
  import spark.implicits._

  private def v1 = Seq(
    (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)
  ).toDF("id", "name", "value")

  test("diff reports added/removed/changed and drops unchanged") {
    val v2 = Seq(
      (1L, "a", 1.0),   // unchanged -> dropped
      (2L, "b", 2.5),   // changed (value)
      (3L, "x", 3.0),   // changed (name)
      (5L, "e", 5.0)    // added; 4 removed
    ).toDF("id", "name", "value")
    val got = Diff.byKey(v1, v2, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("null payloads compare null-safely") {
    val a = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("id", "name")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "name")
    val got = Diff.byKey(a, b, Seq("id")).as[(Long, String)].collect().toSet
    // null == null is NOT a change; x -> null is
    assert(got === Set((2L, "changed")))
  }

  test("identical snapshots diff to empty, single join in the plan") {
    val d = Diff.byKey(v1, v1, Seq("id"))
    assert(d.count() === 0)
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter") && !plan.contains("CartesianProduct"), plan)
  }
}
