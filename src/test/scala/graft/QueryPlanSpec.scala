package graft

/** Plan-shape assertions for the declared SQL-surface queries — the
  * properties that matter at 1000 executors, pinned at test scale.
  */
class QueryPlanSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("global plan sweep: no cartesian product in ANY declared query; " +
      "nested-loop joins only in the declared brute-force baselines") {
    // the exact-scan baselines broadcast a tiny query side through a
    // non-equi join by design — everything else must plan equi-joins.
    // sim_ann_projected's candidate stage is the same shape deliberately:
    // a whole-corpus scan against the broadcast query set (linear in
    // corpus × queries, never corpus²) — just over 16-double projected
    // rows instead of 64-float embeddings. sim_topk_int8 likewise: the
    // same linear scan over d code BYTES + 4 scalars per row (the
    // memory-bandwidth variant of the exact path).
    // sim_pq_topk / sim_pq_sampled / sim_pq_indexed: the same linear
    // scan again, over m code shorts per row ADC-scored against the
    // broadcast per-query lookup tables (32x narrower than the float
    // path — representation width, not join shape, is its scale lever;
    // the composition that also bounds the candidate SET is
    // sim_ivfpq_topk, which must and does plan an equi-join on cell).
    // kanon_risk: its nested-loop is the ONE-ROW total-count broadcast
    // cross join (the in-plan scalar denominator) — |risky classes| x 1
    // rows, the standard scalar-subquery shape, not a data-sized loop.
    // hybrid_search_rrf: its vector arm IS sim_topk's declared exact-scan
    // baseline (one broadcast query against the corpus, linear never
    // quadratic); the fusion itself is a k x k full-outer equi-join.
    val bruteForceBaselines =
      Set("sim_topk", "hard_negatives", "sim_ann_projected", "sim_topk_int8",
        "sim_pq_topk", "sim_pq_sampled", "sim_pq_indexed", "kanon_risk",
        "hybrid_search_rrf")
    val skip = (name: String) => name.startsWith("stream_") // execute on declaration
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val plan = planOf(name)
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !bruteForceBaselines(name)
        if (cartesian || bnlj) Some(name) else None
      }
    assert(offenders.isEmpty, s"unexpected nested-loop/cartesian plans: $offenders")
  }

  test("q5 snowflake: dims broadcast, no cartesian product anywhere") {
    val plan = planOf("q5_region_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("correlated EXISTS decorrelates to semi/anti joins, never a subquery loop") {
    val plan = planOf("exists_subquery")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("array analytics is map-only: no exchange before the sort") {
    val plan = planOf("array_analytics")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 0, s"expected no hash exchange:\n$plan")
  }

  test("approx_sketches keeps the exact distinct count off the distinct-rewrite path") {
    // countDistinct in the SAME aggregate as the sketches makes Catalyst
    // carry the HLL + percentile object buffers per (event_type, user_id)
    // partial group through three ObjectHashAggregate passes (measured
    // 6x slower) — the exact count must stay a separate codegen'd hash
    // aggregate broadcast-joined to the 5-row sketch aggregate
    val plan = planOf("approx_sketches")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!"ObjectHashAggregate\\(keys=\\[event_type#\\d+, user_id".r
      .findFirstIn(plan).isDefined,
      s"sketch buffers must never be keyed per user:\n$plan")
  }

  test("json_quarantine parses the corpus exactly once") {
    // one scan of events, one from_json, one hash agg — the quarantine
    // bucket rides the same aggregation as the valid buckets (the former
    // two-aggregation union parsed and scanned the corpus twice)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case f: FileSourceScanExec => 1
        case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      }.sum
    val exec = SparkEntry.queries("json_quarantine")(spark, sf)
      .queryExecution.executedPlan
    assert(fileScans(exec) == 1, exec.toString.take(2000))
    val plan = planOf("json_quarantine")
    assert("from_json".r.findAllIn(plan).length <= 1, plan.take(2000))
  }

  test("window top-k pushes the rank filter into the sort (WindowGroupLimit)") {
    // Spark's WindowGroupLimit keeps only k rows per group through the
    // sort instead of ranking everything and filtering after — the
    // optimization that makes window top-k viable on huge groups
    val plan = planOf("topk_per_group")
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
