package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Range-clustered writer: file ranges must be disjoint so row-group
  * stats can prune scans; the data itself must round-trip unchanged.
  */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("clustered write: disjoint per-file key ranges, lossless round-trip") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/events"
    val ev = Tables.events(spark, sf)
    Layout.clusteredWrite(ev, dir, numFiles = 4, maxRecordsPerFile = 100000,
      col("user_id"), col("event_id"))

    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    assert(back.select("event_id").except(ev.select("event_id")).isEmpty)

    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    assert(parts.length >= 2, "range partitioning should emit multiple files")
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min("user_id"), max("user_id")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"file key ranges must not interleave: $hiA > $loB")
      case _ =>
    }
  }

  test("rows are sorted within each file (tight row-group statistics)") {
    val dir = Files.createTempDirectory("graft-layout2").toString + "/events"
    Layout.clusteredWrite(Tables.events(spark, sf), dir, numFiles = 2,
      maxRecordsPerFile = 100000, col("user_id"))
    val aFile = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val ids = spark.read.parquet(aFile).select("user_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), "within-file order must follow the cluster key")
  }
}
