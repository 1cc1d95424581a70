package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("pagerank: symmetric 2-cycle is the stationary uniform distribution") {
    val got = Graph.pagerank(sym((1L, 2L)), iters = 5)
      .select("node", "score").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("pagerank: star graph matches the scalar recurrence with per-round rounding") {
    val edges = sym((0L, 1L), (0L, 2L), (0L, 3L))
    val got = Graph.pagerank(edges, iters = 3)
      .select("node", "score").as[(Long, Double)].collect().toMap
    // same recurrence in plain doubles: hub degree 3, leaves degree 1
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var hub = 0.25; var leaf = 0.25
    for (_ <- 1 to 3) {
      val h2 = r9(0.15 / 4 + 0.85 * (leaf / 1 + leaf / 1 + leaf / 1))
      val l2 = r9(0.15 / 4 + 0.85 * (hub / 3))
      hub = h2; leaf = l2
    }
    assert(got(0L) == hub)
    assert(got(1L) == leaf && got(2L) == leaf && got(3L) == leaf)
  }

  test("pagerank: mass is conserved on a symmetric graph") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val total = Graph.pagerank(edges, iters = 4)
      .agg(sum("score")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("pagerank: out_deg column matches the edge list") {
    val got = Graph.pagerank(sym((0L, 1L), (0L, 2L)), iters = 1)
      .select("node", "out_deg").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("triangle counts: two sharing triangles, reversed/duplicate edges canonicalized") {
    // triangles {1,2,3} and {3,4,5}; (5,6) closes nothing; (2,1) and a
    // repeat of (1,3) must not double-count
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (3L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("triangle counts: K4 has four triangles, three per node") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("id_a", "id_b")
    val got = Graph.triangleCounts(k4).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts: star hub with no triangles yields empty, not a wedge blow-up") {
    // a 200-leaf star has 19 900 wedges under min-ID orientation but ZERO
    // under degree-ordering (the hub ranks highest, so it has out-degree
    // 0 and every leaf points only at the hub) — and no triangles either
    val star = (1L to 200L).map(l => (0L, l)).toDF("id_a", "id_b")
    assert(Graph.triangleCounts(star).isEmpty)
  }

  test("deterministic walks: valid edges, full length, reproducible under repartition") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val walks = Graph.deterministicWalks(edges, steps = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    // one walk per node, steps+1 rows each, starting at the start node
    assert(walks.count(_._2 == 0) === 4)
    assert(walks.size === 4 * 4)
    walks.filter(_._2 == 0).foreach { case (s, _, n) => assert(s === n) }
    // every hop follows an actual edge
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    walks.groupBy(_._1).values.foreach { path =>
      path.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) => assert(edgeSet.contains((a, b)))
        case _ =>
      }
    }
    // hash-determinism: identical output from a repartitioned edge list
    val again = Graph.deterministicWalks(edges.repartition(7), steps = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(again === walks)
  }

  test("deterministic walks: a dead end ends the walk, keeping the steps taken") {
    // directed chain into a sink: 1 -> 2 -> 3, and 3 has NO out-edges.
    // r8 verdict #7: the old inner-join step dropped the whole walker row
    // at the dead end, erasing even the steps already taken.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val walks = Graph.deterministicWalks(edges, steps = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    // walks start only at nodes with out-degree >= 1 (1 and 2); each is
    // forced down the chain and ENDS at the sink — no phantom repeats of
    // node 3 padding the path to `steps`
    assert(walks === Seq(
      (1L, 0, 1L), (1L, 1, 2L), (1L, 2, 3L),
      (2L, 0, 2L), (2L, 1, 3L)).sorted)
  }

  test("triangle counts: candidate pairs materialize once, not once per join arm") {
    // the expensive pairs input (production: a full MinHash-LSH pipeline)
    // must appear in the plan only as the one pinned materialization —
    // three references, zero re-derivations of the upstream source.
    // Asserted structurally on the optimized logical plan (node classes,
    // not rendered strings — r6 ADVICE: string matching breaks on plan-
    // format changes without any real regression) — the cache rewrite has
    // already happened there and AQE wrapping never obscures it.
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val docs = Tables.documents(spark, sf)
    val plan = Graph.triangleCounts(
        graft.operators.Dedup.minhashLshPairs(docs, 3, 16, 4, 0.6))
      .queryExecution.optimizedPlan
    try {
      val pinnedRefs = plan.collect { case m: InMemoryRelation => m }
      val sourceScans = plan.collect { case l: LogicalRelation => l }
      assert(sourceScans.isEmpty, plan.toString.take(2000))
      assert(pinnedRefs.size == 3, plan.toString.take(2000))
    } finally { Residue.drain(spark) }
  }
}
