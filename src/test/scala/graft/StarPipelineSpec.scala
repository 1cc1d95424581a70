package graft

import org.apache.spark.sql.functions._
import graft.operators.StarPipeline

/** Star ETL shape checks (SURVEY.md §2 S2-S8): rename takes effect, inner
  * joins preserve upstream duplicates, projection prunes the scan, both
  * dimension joins broadcast (no shuffle of the fact side).
  */
class StarPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("rename produces trn_ columns and drops originals") {
    val cols = StarPipeline.renamed(Tables.lineitem(spark, sf)).columns.toSet
    assert(cols("trn_partkey") && cols("trn_suppkey"))
    assert(!cols("l_partkey") && !cols("l_suppkey"))
  }

  test("denormalized row count equals fact count (FK-complete inner join)") {
    assert(StarPipeline.denormalized(spark, sf).count() ==
      Tables.lineitem(spark, sf).count())
  }

  test("inner join preserves upstream duplicate keys (no implicit dedup)") {
    val fact = Seq((1, 100), (1, 100)).toDF("fk", "amount") // dupe rows
    val dim = Seq((1, "x")).toDF("pk", "name")
    val joined = fact.join(dim, $"fk" === $"pk", "inner")
    assert(joined.count() == 2)
  }

  test("projection prunes the parquet scan to the needed columns") {
    val plan = StarPipeline.denormalized(spark, sf)
      .queryExecution.executedPlan.toString
    // lineitem scan must not read l_comment-like unused cols, e.g. l_tax
    assert(!plan.contains("l_tax") && !plan.contains("l_returnflag"),
      s"unused fact columns leaked into the scan:\n$plan")
  }

  test("both dimension joins are broadcast (fact side never shuffled)") {
    val plan = StarPipeline.denormalized(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$plan")
  }

  test("reports aggregate with partial (map-side) aggregation") {
    val plan = StarPipeline.supplierReport(StarPipeline.denormalized(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
  }
}
