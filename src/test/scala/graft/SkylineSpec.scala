package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSuite {
  import spark.implicits._

  test("pareto frontier keeps non-dominated rows and all ties") {
    val rows = Seq(
      ("a", 10.0, 5L),  // frontier (max total)
      ("b", 8.0, 9L),   // frontier (trade-off)
      ("c", 8.0, 9L),   // exact tie with b: neither dominates -> kept
      ("d", 8.0, 8L),   // dominated by b (equal x, smaller y)
      ("e", 3.0, 9L),   // dominated by b (smaller x, equal y)
      ("f", 1.0, 20L),  // frontier (max n)
      ("g", 1.0, 1L)    // dominated by everything
    ).toDF("id", "total", "n")
    val got = Skyline.pareto2D(rows, "total", "n")
      .select("id").as[String].collect().toSet
    assert(got === Set("a", "b", "c", "f"))
  }

  test("sort-based frontier equals the quadratic NOT-EXISTS formulation") {
    val u = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum($"value"), 2).as("total"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
    u.createOrReplaceTempView("sky_u")
    val brute = spark.sql(
      """SELECT user_id FROM sky_u a WHERE NOT EXISTS (
        |  SELECT 1 FROM sky_u b
        |  WHERE b.total >= a.total AND b.n >= a.n
        |    AND (b.total > a.total OR b.n > a.n))""".stripMargin)
      .as[Long].collect().toSet
    val fast = Skyline.pareto2D(u, "total", "n")
      .select("user_id").as[Long].collect().toSet
    assert(fast === brute && fast.nonEmpty)
  }

  test("no cartesian or nested-loop join in the sort-based plan") {
    val u = Seq((1L, 1.0, 1L)).toDF("id", "x", "y")
    val plan = Skyline.pareto2D(u, "x", "y").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
