package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.MaterializedAgg

class MaterializedAggSpec extends SparkSuite {
  import spark.implicits._

  test("batches fold into state equal to the one-shot aggregate; redelivery is a no-op") {
    val dir = Files.createTempDirectory("graft-mview").toString
    val m = new MaterializedAgg(dir, Seq("k"), "v")

    val b0 = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val b1 = Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v")
    m.sink(b0, 0L)
    m.sink(b1, 1L)

    val got = m.view(spark).get
      .select("k", "n", "total", "lo", "hi", "mean")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    assert(got == Set(
      ("a", 3L, 7.0, 1.0, 4.0, 2.3333),
      ("b", 1L, 5.0, 5.0, 5.0, 5.0),
      ("c", 1L, 7.0, 7.0, 7.0, 7.0)))

    // crash-redelivery of an already-applied batch must not double-count
    m.sink(b1, 1L)
    assert(m.currentPointer().get == (1L, 1L))
    val after = m.view(spark).get.agg(sum("n")).as[Long].head()
    assert(after == 5L, "redelivered batch must be a no-op")

    // superseded versions are pruned: after batch 2 only v1 and v2 remain
    m.sink(Seq(("d", 9.0)).toDF("k", "v"), 2L)
    val versions = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).sorted
    assert(versions.toSeq == Seq("v1", "v2"), s"expected pruning, got ${versions.toSeq}")
    assert(m.view(spark).get.count() == 4)
  }

  test("a reader on another instance resolves the committed pointer") {
    val dir = Files.createTempDirectory("graft-mview2").toString
    val w = new MaterializedAgg(dir, Seq("k"), "v")
    assert(w.view(spark).isEmpty, "no state before the first commit")
    w.sink(Seq(("x", 1.0)).toDF("k", "v"), 0L)
    val r = new MaterializedAgg(dir, Seq("k"), "v")
    assert(r.view(spark).get.count() == 1)
  }

  test("drives a real writeStream: state equals the batch aggregate of everything") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-mview3").toString
    val m = new MaterializedAgg(dir, Seq("k"), "v")
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => m.sink(df, id))
      .option("checkpointLocation", Files.createTempDirectory("mview-ckpt").toString)
      .start()
    try {
      mem.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      mem.addData(("a", 3.0))
      q.processAllAvailable()
      val got = m.view(spark).get.select("k", "n", "total")
        .as[(String, Long, Double)].collect().toSet
      assert(got == Set(("a", 2L, 4.0), ("b", 1L, 2.0)))
    } finally q.stop()
  }
}
