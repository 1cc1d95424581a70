package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partitioned layout: `partitionBy` on write, partition pruning on read —
  * at 100 TB the difference between scanning one directory and scanning
  * them all.
  */
class PartitionPruningSpec extends SparkSuite {

  test("a filter on the partition column prunes directories, not just rows") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"), plan)
    // pruned scan reads only the one partition's files
    val scanned = q.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(scanned == 1, s"expected 1 selected partition, got $scanned")
    // and the values are right
    val expected = Tables.events(spark, sf).filter(col("event_type") === "click").count()
    assert(q.count() == expected)
  }
}
