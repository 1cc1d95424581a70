package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, SkewAgg}

class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def ev = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"), col("user_id"), col("value"))

  test("merge of increment states equals the one-shot aggregate") {
    val parts = (0 until 4).map(i => ev.where(pmod(col("event_id"), lit(4)) === i))
    val merged = parts.map(p => IncrementalAgg.aggregate(p, Seq("event_type"), "value"))
      .reduce((a, b) => IncrementalAgg.merge(a, b, Seq("event_type")))
    val oneShot = IncrementalAgg.aggregate(ev, Seq("event_type"), "value")
    // longs and min/max are exact; double totals agree to fold-order noise
    val joined = IncrementalAgg.finish(merged).as("m")
      .join(IncrementalAgg.finish(oneShot).as("o"), "event_type")
    assert(joined.count() > 0)
    val bad = joined.where(
      col("m.n") =!= col("o.n") || col("m.lo") =!= col("o.lo") ||
        col("m.hi") =!= col("o.hi") || col("m.total") =!= col("o.total") ||
        col("m.mean") =!= col("o.mean")).count()
    assert(bad == 0, "merged state must equal one-shot aggregate")
  }

  test("merge is state-sized: no rescan of raws, one shuffle over the union") {
    val a = IncrementalAgg.aggregate(ev.where(col("event_id") % 2 === 0), Seq("event_type"), "value")
    val plan = IncrementalAgg.merge(a, a, Seq("event_type"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      s"merge must combine map-side too:\n$plan")
  }

  test("salted distinct count equals countDistinct exactly") {
    val got = SkewAgg.distinctCountSalted(ev, Seq("event_type"), "user_id", 16)
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_distinct"))
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("salted distinct first phase groups by (key, shard of distinct column)") {
    val plan = SkewAgg.distinctCountSalted(ev, Seq("event_type"), "user_id", 16)
      .queryExecution.executedPlan.toString
    // the wide (value-set-sized) phase is keyed by (key, salt) — the salt
    // shows up as a _groupingexpression — so the exchange spreads a hot
    // key over `salts` tasks
    assert("Exchange hashpartitioning\\(event_type#\\d+, (_salt|_groupingexpression)".r
      .findFirstIn(plan).isDefined, s"phase-1 exchange not salted:\n$plan")
  }
}
