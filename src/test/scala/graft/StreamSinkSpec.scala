package graft

import java.nio.file.Files
import java.sql.DriverManager
import graft.streaming.StreamSink

/** Exactly-once foreachBatch JDBC delivery against embedded Derby. */
class StreamSinkSpec extends SparkSuite {
  import spark.implicits._

  private val dbDir = Files.createTempDirectory("derby-stream").toString
  private def url = s"jdbc:derby:$dbDir/sinkdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  private def countOf(table: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT count(*) FROM $table")
        rs.next(); rs.getLong(1)
      } finally st.close()
    } finally c.close()
  }

  test("micro-batches land once; a re-delivered batch is a no-op; failure is atomic") {
    exec("CREATE TABLE report_s (k BIGINT, total DOUBLE)")
    exec(StreamSink.ledgerDdl("ledger_s"))
    val sink = StreamSink.exactlyOnceJdbc(url,
      "INSERT INTO report_s VALUES (?, ?)", "ledger_s", "q1") { (ps, r) =>
      ps.setLong(1, r.getLong(0)); ps.setDouble(2, r.getDouble(1))
    }

    val b0 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "total")
    sink(b0, 0L)
    assert(countOf("report_s") == 2)
    assert(countOf("ledger_s") == 1)

    // crash-redelivery of the SAME batch id: ledger makes it a no-op
    sink(b0, 0L)
    assert(countOf("report_s") == 2, "re-delivered batch must not duplicate")

    // next batch appends
    sink(Seq((3L, 30.0)).toDF("k", "total"), 1L)
    assert(countOf("report_s") == 3)
    assert(countOf("ledger_s") == 2)

    // a batch that fails mid-insert leaves neither rows nor a ledger entry
    val bad = StreamSink.exactlyOnceJdbc(url,
      "INSERT INTO report_s VALUES (?, ?)", "ledger_s", "q1") { (ps, r) =>
      ps.setString(1, "not a number"); ps.setDouble(2, 0.0)
    }
    intercept[java.sql.SQLException] { bad(Seq((9L, 9.0)).toDF("k", "total"), 2L) }
    assert(countOf("report_s") == 3, "failed batch rolled back")
    assert(countOf("ledger_s") == 2, "failed batch must not be marked delivered")
  }

  test("drives a real writeStream.foreachBatch query end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    exec("CREATE TABLE report_live (k BIGINT, total DOUBLE)")
    exec(StreamSink.ledgerDdl("ledger_live"))
    val sink = StreamSink.exactlyOnceJdbc(url,
      "INSERT INTO report_live VALUES (?, ?)", "ledger_live", "live") { (ps, r) =>
      ps.setLong(1, r.getLong(0)); ps.setDouble(2, r.getDouble(1))
    }
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("k", "total")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => sink(df, id))
      .option("checkpointLocation", Files.createTempDirectory("sink-ckpt").toString)
      .start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 3.0))
      q.processAllAvailable()
      assert(countOf("report_live") == 3)
      assert(countOf("ledger_live") >= 2)
    } finally q.stop()
  }

  test("exactlyOnceParquet: forced double delivery is a no-op; crashed batch is invisible then overwritten") {
    val out = TempDirs.create("eop-sink")
    val ckpt = "ckpt-lineage-A"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    StreamSink.exactlyOnceParquet(out, b0, 0L, ckpt)
    StreamSink.exactlyOnceParquet(out, Seq((3L, "c")).toDF("doc_id", "text"), 1L, ckpt)
    val first = StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet
    assert(first === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // forced REDELIVERY of both batches — with different (corrupt) data,
    // so an accidental overwrite would be visible: output must be
    // byte-identical because the watermark makes redelivery a no-op
    StreamSink.exactlyOnceParquet(out, Seq((99L, "X")).toDF("doc_id", "text"), 0L, ckpt)
    StreamSink.exactlyOnceParquet(out, Seq((98L, "Y")).toDF("doc_id", "text"), 1L, ckpt)
    val second = StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet
    assert(second === first, "re-delivered batches must not change output")

    // a batch whose write crashed before the watermark advanced: simulate
    // by writing the subdir directly — committedParquet must not see it,
    // and the redelivered exactlyOnceParquet replaces it
    Seq((7L, "partial")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/batch-2")
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === first)
    StreamSink.exactlyOnceParquet(out, Seq((4L, "d")).toDF("doc_id", "text"), 2L, ckpt)
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === first + ((4L, "d")))
  }

  test("exactlyOnceParquet refuses a new checkpoint lineage on an old outDir") {
    // r12 advice (medium): a fresh checkpoint restarts batchIds at 0, so
    // an outDir that outlives its checkpoint would treat every new batch
    // below the stale watermark as a redelivery and silently DROP it —
    // the sink must refuse loudly instead of losing data
    val out = TempDirs.create("eop-lineage")
    StreamSink.exactlyOnceParquet(out,
      Seq((1L, "a")).toDF("doc_id", "text"), 5L, "ckpt-old")
    val ex = intercept[IllegalArgumentException] {
      StreamSink.exactlyOnceParquet(out,
        Seq((2L, "b")).toDF("doc_id", "text"), 0L, "ckpt-NEW")
    }
    assert(ex.getMessage.contains("lineage"))
    // the original lineage keeps delivering normally after the refusal
    StreamSink.exactlyOnceParquet(out,
      Seq((3L, "c")).toDF("doc_id", "text"), 6L, "ckpt-old")
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (3L, "c")))
  }

  test("compactParquet folds committed batches; delivery, redelivery, and retirement unchanged") {
    // r13: the read-amplification half for the OUTPUT table — one dir per
    // micro-batch buys exactly-once, compaction keeps readers from paying
    // per-fragment cost over the whole query lifetime
    val out = TempDirs.create("eop-compact")
    val ckpt = "ckpt-cmp"
    StreamSink.exactlyOnceParquet(out, Seq((1L, "a")).toDF("doc_id", "text"), 0L, ckpt)
    StreamSink.exactlyOnceParquet(out, Seq((2L, "b")).toDF("doc_id", "text"), 1L, ckpt)
    val before = StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet
    StreamSink.compactParquet(spark, out)
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === before)
    // redelivery of a compacted (committed) batch is STILL a no-op
    StreamSink.exactlyOnceParquet(out, Seq((99L, "X")).toDF("doc_id", "text"), 1L, ckpt)
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === before)
    // delivery continues on top of the base
    StreamSink.exactlyOnceParquet(out, Seq((3L, "c")).toDF("doc_id", "text"), 2L, ckpt)
    val withC = before + ((3L, "c"))
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === withC)
    // recompact with retirement: the reader must answer from the base alone
    StreamSink.compactParquet(spark, out, retireSuperseded = true)
    val df = StreamSink.committedParquet(spark, out)
    assert(df.as[(Long, String)].collect().toSet === withC)
    assert(df.inputFiles.forall(_.contains("base-2")), df.inputFiles.mkString(","))
    // already folded through the watermark: no-op
    StreamSink.compactParquet(spark, out)
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === withC)
  }

  test("a crashed compactParquet (base written, slot not committed) is invisible") {
    val out = TempDirs.create("eop-compact-crash")
    val ckpt = "ckpt-cmp2"
    StreamSink.exactlyOnceParquet(out, Seq((1L, "a")).toDF("doc_id", "text"), 0L, ckpt)
    StreamSink.exactlyOnceParquet(out, Seq((2L, "b")).toDF("doc_id", "text"), 1L, ckpt)
    val before = StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet
    // orphan base dir with garbage: the slot never renamed in
    Seq((77L, "garbage")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/base-1")
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === before)
    // the re-run overwrites the orphan and commits atomically
    StreamSink.compactParquet(spark, out)
    assert(StreamSink.committedParquet(spark, out)
      .as[(Long, String)].collect().toSet === before)
  }
}
