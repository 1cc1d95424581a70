package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ParallelReports, StarPipeline}

/** Parallelism semantics (SURVEY.md §2 S11, §5 item 3): concurrent ≡
  * sequential; the pool-local property is set inside each task and cleared
  * after (reference defect D8 fixed); FAIR mode is live in the session.
  */
class ParallelReportsSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("FAIR scheduler mode is active with the reference pool allocation") {
    assert(spark.sparkContext.getSchedulingMode.toString == "FAIR")
  }

  test("two concurrent reports equal their sequential runs") {
    val shared = StarPipeline.denormalized(spark, sf).cache()
    val specs = Seq(
      ParallelReports.ReportSpec("supplier", "1", StarPipeline.supplierReport),
      ParallelReports.ReportSpec("part_brand", "2", StarPipeline.partBrandReport))
    val concurrent = ParallelReports.run(spark, shared, specs)(canon).toMap
    assert(concurrent("supplier") == canon(StarPipeline.supplierReport(shared)))
    assert(concurrent("part_brand") == canon(StarPipeline.partBrandReport(shared)))
    shared.unpersist()
  }

  test("pool property set during task, cleared afterwards, per thread") {
    val shared = StarPipeline.denormalized(spark, sf)
    val seen = ParallelReports.run(spark, shared,
      Seq(ParallelReports.ReportSpec("a", "1", identity),
          ParallelReports.ReportSpec("b", "2", identity))) { _ =>
      spark.sparkContext.getLocalProperty("spark.scheduler.pool")
    }.toMap
    assert(seen == Map("a" -> "1", "b" -> "2"))
    assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
  }

  test("a failing report propagates instead of being swallowed (defect D4)") {
    val shared = StarPipeline.denormalized(spark, sf)
    intercept[RuntimeException] {
      ParallelReports.run(spark, shared,
        Seq(ParallelReports.ReportSpec("boom", "1",
          _ => throw new RuntimeException("report failed"))))(_.count())
    }
  }
}
