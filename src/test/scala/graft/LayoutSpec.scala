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

  test("dynamic partition overwrite: restated partitions replaced, others byte-identical") {
    // The partition_overwrite declared query's structural claim: the
    // correction write replaces ONLY the partitions present in it.
    val root = Files.createTempDirectory("graft-dynpart-spec").toString + "/t"
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      ev.repartition(col("day")).write.mode("overwrite")
        .partitionBy("day").parquet(root)
      val days = ev.select(col("day")).distinct()
        .orderBy(col("day").desc).as[String].collect()
      val (restated, untouchedDay) = (days.take(2).toSeq, days.last)
      def listing(day: String): Seq[(String, Long)] = {
        val d = new java.io.File(s"$root/day=$day")
        d.listFiles().filter(_.getName.startsWith("part-"))
          .map(f => (f.getName, f.lastModified())).toSeq.sorted
      }
      val before = listing(untouchedDay)
      val beforeRestated = listing(restated.head)
      ev.filter(col("day").isin(restated: _*) && col("event_type") =!= "error")
        .repartition(col("day")).write.mode("overwrite")
        .partitionBy("day").parquet(root)
      assert(listing(untouchedDay) == before,
        "an untouched partition's files must survive the correction write")
      assert(listing(restated.head) != beforeRestated,
        "a restated partition must have been rewritten")
      val back = spark.read.parquet(root)
        .withColumn("day", col("day").cast("string"))
      assert(back.filter(col("day").isin(restated: _*) &&
        col("event_type") === "error").isEmpty, "corrected days keep no error rows")
      assert(back.filter(!col("day").isin(restated: _*) &&
        col("event_type") === "error").count() > 0,
        "uncorrected days keep their error rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("zorder interleaves bits: bit b of cell i lands at b*n + i") {
    val got = Seq(1).toDF("x")
      .select(Layout.zorder(2, lit(3L), lit(2L)).as("z"))
      .as[Long].head()
    // cells (0b11, 0b10): pos0 = a.b0 = 1, pos1 = b.b0 = 0,
    //                     pos2 = a.b1 = 1, pos3 = b.b1 = 1 -> 0b1101
    assert(got == 13L)
  }

  test("zorder layout prunes on EVERY z dimension; range layout only on its key") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val ev = Tables.events(spark, sf)
    Layout.zorderWrite(ev, s"$base/z", numFiles = 8,
      maxRecordsPerFile = 100000, bitsPerCol = 8,
      col("user_id"), col("event_id"))
    Layout.clusteredWrite(ev, s"$base/r", numFiles = 8,
      maxRecordsPerFile = 100000, col("user_id"))

    def overlapping(dir: String, key: String, lo: Long, hi: Long): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
      val n = files.count { p =>
        val (mn, mx) = spark.read.parquet(p)
          .agg(min(col(key)), max(col(key))).as[(Long, Long)].head()
        mx >= lo && mn <= hi
      }
      (n, files.length)
    }

    // a narrow range on each dimension (~1/8 of each domain)
    val (uLo, uHi) = ev.agg(min("user_id"), max("user_id")).as[(Long, Long)].head()
    val (eLo, eHi) = ev.agg(min("event_id"), max("event_id")).as[(Long, Long)].head()
    def narrow(lo: Long, hi: Long): (Long, Long) = (lo, lo + (hi - lo) / 8)
    val (nu, tu) = { val (a, b) = narrow(uLo, uHi); overlapping(s"$base/z", "user_id", a, b) }
    val (ne, te) = { val (a, b) = narrow(eLo, eHi); overlapping(s"$base/z", "event_id", a, b) }
    assert(nu < tu, s"z layout must prune user_id ranges ($nu of $tu files overlap)")
    assert(ne < te, s"z layout must prune event_id ranges ($ne of $te files overlap)")

    // the single-key range layout cannot prune the non-key dimension
    val (nr, tr) = { val (a, b) = narrow(eLo, eHi); overlapping(s"$base/r", "event_id", a, b) }
    assert(nr == tr, "single-key layout was expected to interleave event_id across all files")
    // and the z layout must round-trip losslessly
    assert(spark.read.parquet(s"$base/z").count() == ev.count())
  }

  test("zorder write degrades gracefully on empty input and all-NULL columns") {
    val base = Files.createTempDirectory("graft-zorder-e").toString
    val empty = Tables.events(spark, sf).where(lit(false))
    Layout.zorderWrite(empty, s"$base/empty", 2, 1000, 4,
      col("user_id"), col("event_id"))
    assert(spark.read.parquet(s"$base/empty").count() == 0)
    val withNull = Tables.events(spark, sf)
      .withColumn("nullcol", lit(null).cast("long")).limit(100)
    Layout.zorderWrite(withNull, s"$base/nulls", 2, 1000, 4,
      col("user_id"), col("nullcol"))
    assert(spark.read.parquet(s"$base/nulls").count() == 100)
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
