package graft

import org.apache.spark.sql.functions._
import graft.operators.DqChecks._

class DqChecksSpec extends SparkSuite {
  import spark.implicits._

  private def fact = Seq[(Long, java.lang.Long, Double, String)](
    (1L, 10L, 5.0, "O"),
    (2L, 10L, -1.0, "F"), // range violation
    (2L, 20L, 3.0, "X"),  // duplicate key + bad status + orphan fk 20
    (3L, null, 2.0, "O")  // null custkey
  ).toDF("k", "cust", "price", "status")

  private def dim = Seq(10L, 30L).toDF("dk")

  test("violations counted per constraint; fk orphans via anti-join") {
    val got = checks(fact,
      rowChecks = Seq(
        RowCheck("not_null", "cust", col("cust").isNull),
        RowCheck("not_null", "k", col("k").isNull),
        RowCheck("in_range", "price", col("price") < 0 || col("price") > 100),
        RowCheck("accepted_values", "status", !col("status").isin("O", "F"))),
      uniqueCols = Seq("k"),
      fks = Seq(FkCheck("fk_dim", "cust", dim, "dk")))
      .select("check_name", "column_name", "violations", "passed")
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("not_null", "cust", 1L, false),
      ("not_null", "k", 0L, true),
      ("in_range", "price", 1L, false),
      ("accepted_values", "status", 1L, false),
      ("unique", "k", 1L, false),
      ("fk_dim", "cust", 1L, false)))
  }

  test("row checks and uniqueness fuse into one aggregation - no join in the plan") {
    val fused = checks(fact,
      rowChecks = Seq(RowCheck("in_range", "price", col("price") < 0)),
      uniqueCols = Seq("k"))
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(fused.count() == 2)
  }

  test("empty table: zero violations everywhere, fk check included") {
    val got = checks(fact.where(lit(false)),
      rowChecks = Seq(RowCheck("not_null", "cust", col("cust").isNull)),
      uniqueCols = Seq("k"),
      fks = Seq(FkCheck("fk_dim", "cust", dim, "dk")))
      .select("violations").as[Long].collect()
    assert(got.toSeq == Seq(0L, 0L, 0L))
  }
}
