package graft

import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  test("gaps are emitted, forward-filled, and flagged with n_obs = 0") {
    val ev = Seq(
      (1L, 0L, 10.0), (1L, 5L, 2.0),    // bucket 0: two obs
      (1L, 30L, 7.0),                    // buckets 10,20 missing
      (2L, 10L, 1.0)
    ).toDF("k", "tss", "value")
    val got = Resample.gapFill(ev, "k", "tss", "value", 10L)
      .select("k", "bucket", "v_filled", "n_obs")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 12.0, 2L),
      (1L, 10L, 12.0, 0L),   // filled from bucket 0
      (1L, 20L, 12.0, 0L),
      (1L, 30L, 7.0, 1L),
      (2L, 10L, 1.0, 1L)))
  }

  test("every key's grid is dense from first to last bucket, never null") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), Tables.eventSeconds.as("tss"), col("value"))
    val out = Resample.gapFill(ev, "user_id", "tss", "value", 86400L).cache()
    try {
      assert(out.where(col("v_filled").isNull).count() == 0)
      val bad = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"), min("bucket").as("lo"), max("bucket").as("hi"))
        .where(col("n") =!= (col("hi") - col("lo")) / 86400L + 1L)
        .count()
      assert(bad == 0, "grid must have exactly (hi-lo)/step + 1 rows per key")
    } finally out.unpersist()
  }

  test("raw rows are compacted by a partial agg before any exchange; no nested loop") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), Tables.eventSeconds.as("tss"), col("value"))
    val plan = Resample.gapFill(ev, "user_id", "tss", "value", 86400L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      s"no map-side combine before the shuffle:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"grid must not be a cross join:\n$plan")
  }
}
