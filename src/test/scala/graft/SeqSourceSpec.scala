package graft

import org.apache.spark.sql.functions._

class SeqSourceSpec extends SparkSuite {
  import spark.implicits._

  private def seq(rows: Long, partitions: Int = 4) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows.toString).option("partitions", partitions.toString)
      .load()

  test("generates the documented deterministic rows") {
    val got = seq(5).select("id", "bucket", "val", "tag")
      .as[(Long, Int, Double, String)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.map(_._2).toSeq == Seq(0, 1, 2, 3, 4))
    assert(got.map(_._4).toSeq == Seq("t0", "t1", "t2", "t3", "t4"))
    got.foreach { case (id, _, v, _) =>
      assert(v == graft.sources.SeqSource.valOf(id))
    }
  }

  test("id-range filters are pushed: partitions outside the range are never planned") {
    // rows=10000 over 10 partitions of width 1000; id >= 9000 leaves one
    val df = seq(10000, 10).filter(col("id") >= 9000)
    assert(df.rdd.getNumPartitions == 1,
      "pushed range must prune whole input partitions")
    assert(df.count() == 1000)
    // the scan itself reports the narrowed range
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("[9000, 10000)"), s"range not pushed into the scan:\n$plan")
  }

  test("half-open boundaries: >, >=, <, <= all narrow correctly") {
    assert(seq(100).filter(col("id") > 10 && col("id") < 20).count() == 9)
    assert(seq(100).filter(col("id") >= 10 && col("id") <= 20).count() == 11)
    val empty = seq(100).filter(col("id") >= 80 && col("id") < 20)
    assert(empty.count() == 0 && empty.rdd.getNumPartitions == 0)
  }

  test("non-range predicates stay in Spark's filter, results still exact") {
    val df = seq(1000).filter(col("tag") === "t3" && col("id") < 100)
    assert(df.count() == 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("[0, 100)"), s"range half must still push:\n$plan")
    assert(plan.contains("Filter"), "tag predicate must remain post-scan")
  }

  test("column pruning reaches the reader") {
    val df = seq(1000).select("bucket")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("bucket"), s"scan must output bucket: $scanLine")
    assert(!scanLine.contains("tag#"), s"unprojected columns must be pruned: $scanLine")
    assert(df.distinct().count() == 97)
  }
}
