package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("bounded streaming window agg equals the batch aggregation") {
    val streamed = Streaming.runToCompletion(
      Streaming.dailyTypeCounts(Streaming.events(spark, sf)), OutputMode.Complete())
    val batch = Tables.events(spark, sf)
      .withColumn("day_start",
        Tables.eventSeconds - (Tables.eventSeconds % 86400))
      .groupBy(col("day_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("bounded streaming session_window equals batch gaps-and-islands") {
    val streamed = Streaming.runToCompletion(
      Streaming.userSessions(Streaming.events(spark, sf)), OutputMode.Complete())
    val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Tables.eventSeconds.as("tss"))
      .withColumn("prev", lag(col("tss"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull || col("tss") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("tss")).as("session_start"), (max(col("tss")) + 1800).as("session_end"),
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"), max(col("event_id")).as("last_event"))
      .drop("sid")
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("windowed-agg state is bounded by window + disorder, not stream length") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("sec", "event_type", "value")
      .withColumn("event_ts", timestamp_seconds(col("sec")))
    val q = Streaming.dailyTypeCounts(stream)
      .writeStream.format("memory").queryName("wm_state")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-wm-ckpt").toString)
      .start()
    try {
      mem.addData((0L, "click", 1.0), (3600L, "view", 2.0)) // day 0, 2 groups
      q.processAllAvailable()
      // 40 days later: the 30-min-disorder watermark passes day 0 + delay,
      // so both day-0 window rows must leave the state store
      mem.addData((86400L * 40, "click", 1.0))
      q.processAllAvailable()
      mem.addData((86400L * 40 + 60, "view", 1.0))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2, s"day-0 window state must be evicted, got $stateRows")
      assert(spark.table("wm_state").count() >= 4, "every window was still emitted")
    } finally q.stop()
  }

  test("events later than the disorder bound are dropped — pinned across batches") {
    // The 30-min default watermark is a DROP bound, not just a state bound:
    // an event arriving >30 min behind the stream's high-water mark is
    // silently discarded by every watermarked stateful operator. Bounded
    // single-batch AvailableNow runs can never observe this (the watermark
    // only advances BETWEEN micro-batches), so this test pins the
    // documented semantics the way production would hit them: late data
    // delivered in a later micro-batch.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // windowed agg (update mode): the late row must not reopen its window
    val aggMem = MemoryStream[(Long, String, Double)]
    val aggStream = aggMem.toDF().toDF("sec", "event_type", "value")
      .withColumn("event_ts", timestamp_seconds(col("sec")))
    val aggQ = Streaming.dailyTypeCounts(aggStream)
      .writeStream.format("memory").queryName("late_agg")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-late-agg-ckpt").toString)
      .start()
    try {
      aggMem.addData((1000L, "click", 1.0))
      aggQ.processAllAvailable()
      // advance the watermark far past day 0 + 30 min
      aggMem.addData((86400L * 40, "click", 1.0))
      aggQ.processAllAvailable()
      // >30-min-late arrival for day 0: dropped, no update emitted
      aggMem.addData((2000L, "click", 5.0))
      aggQ.processAllAvailable()
      assert(aggQ.lastProgress.stateOperators.map(_.numRowsUpdated).sum == 0,
        "late row must not update any window")
      val day0 = spark.table("late_agg").filter(col("day_start") === 0)
        .agg(max(col("n_events"))).head.getLong(0)
      assert(day0 == 1, s"day-0 window must still count only the on-time row, got $day0")
    } finally aggQ.stop()

    // within-watermark dedup: a late event vanishes entirely (that is the
    // bounded-state trade-off dedupEventsWithinWatermark documents)
    val ddMem = MemoryStream[(Long, Long, String, Double, Long)]
    val ddStream = ddMem.toDF().toDF("event_id", "user_id", "event_type", "value", "sec")
      .withColumn("event_ts", timestamp_seconds(col("sec")))
    val ddQ = Streaming.dedupEventsWithinWatermark(ddStream, disorder = "30 minutes")
      .writeStream.format("memory").queryName("late_dd")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-late-dd-ckpt").toString)
      .start()
    try {
      ddMem.addData((1L, 1L, "click", 1.0, 1000L))
      ddQ.processAllAvailable()
      ddMem.addData((2L, 1L, "click", 1.0, 86400L)) // watermark -> 86400-1800
      ddQ.processAllAvailable()
      ddMem.addData((3L, 1L, "click", 1.0, 1001L)) // NOT a duplicate, just late
      ddQ.processAllAvailable()
      val ids = spark.table("late_dd").select("event_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 2L),
        s"late event 3 must be dropped by the watermark, got $ids")
    } finally ddQ.stop()
  }

  test("streaming dedup of a doubled stream emits each event exactly once") {
    val doubled = Streaming.events(spark, sf).union(Streaming.events(spark, sf))
    val got = Streaming.runToCompletion(Streaming.dedupEvents(doubled), OutputMode.Append())
    val n = Tables.events(spark, sf).count()
    assert(got.count() == n)
    assert(got.select("event_id").distinct().count() == n)
  }

  test("within-watermark dedup catches co-timed duplicates with expiring state") {
    val doubled = Streaming.events(spark, sf).union(Streaming.events(spark, sf))
    val got = Streaming.runToCompletion(
      Streaming.dedupEventsWithinWatermark(doubled), OutputMode.Append())
    val n = Tables.events(spark, sf).count()
    assert(got.count() == n)
    assert(got.select("event_id").distinct().count() == n)
  }

  test("streaming incremental dedup: store blocks re-ingests, stream self-dedupes, matches batch set algebra") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val fp = graft.functions.GraftFunctions.poly_hash(col("text"))
    val store = docs.filter(col("doc_id") <= mid)
      .select(fp.as("fingerprint")).distinct()
    val got = Streaming.runToCompletion(
      Streaming.incrementalDedup(
        // double the delta: intra-stream duplicates must emit once
        Streaming.documents(spark, sf).filter(col("doc_id") > mid)
          .union(Streaming.documents(spark, sf).filter(col("doc_id") > mid)),
        store),
      OutputMode.Append())
    val want = docs.filter(col("doc_id") > mid).select(fp.as("fingerprint"))
      .distinct().join(store, Seq("fingerprint"), "left_anti")
    assert(got.count() == want.count())
    assert(got.join(want, Seq("fingerprint"), "left_anti").isEmpty)
  }

  test("stream-static enrichment: broadcast join, no join state, equals batch") {
    val enriched = Streaming.enrichedSegments(
      Streaming.events(spark, sf), Tables.customer(spark, sf))
    val streamed = Streaming.runToCompletion(enriched, OutputMode.Complete())
    val batch = Tables.events(spark, sf).as("e")
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    // the join itself is stateless: only the aggregation keeps state
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val st = mem.toDF().toDF("user_id", "value")
    val q = Streaming.enrichedSegments(st, Tables.customer(spark, sf))
      .writeStream.format("memory").queryName("enrich_state")
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-enr-ckpt").toString)
      .start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.length == 1,
        "exactly one stateful operator (the aggregation); the join adds none")
    } finally q.stop()
  }

  test("stream-stream join state is bounded: watermark evicts rows past the join window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val stream = mem.toDF().toDF("user_id", "event_id", "event_type", "sec")
      .withColumn("event_ts", timestamp_seconds(col("sec")))
    val q = Streaming.clickToPurchase(stream, windowSec = 60, disorder = "10 seconds")
      .writeStream.format("memory").queryName("cp_state")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cp-ckpt").toString)
      .start()
    def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    try {
      // batch 1: a joinable click/purchase pair
      mem.addData((1L, 1L, "click", 1000L), (1L, 2L, "purchase", 1030L))
      q.processAllAvailable()
      // batch 2: second pair far ahead — end-of-batch watermark jumps to
      // 9990, past pair 1's click_ts + window + disorder
      mem.addData((2L, 3L, "click", 10000L), (2L, 4L, "purchase", 10000L))
      q.processAllAvailable()
      // sentinel batches march the watermark forward; eviction applies a
      // batch AFTER the watermark advances, so keep feeding until the four
      // early rows are gone (bounded — fails the assert below if not)
      var tries = 0
      def removed: Long = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      while (removed < 4 && tries < 8) {
        // both event types: the global watermark is the MIN across the two
        // watermark operators, and each only sees its own filtered side —
        // click-only sentinels would pin the purchase watermark forever
        mem.addData(
          (100L + tries, 200L + 2 * tries, "click", 20000L + tries * 20000L),
          (300L + tries, 201L + 2 * tries, "purchase", 20000L + tries * 20000L))
        q.processAllAvailable()
        tries += 1
      }
      assert(spark.table("cp_state").count() == 2, "both pairs joined")
      assert(removed >= 4, s"all four early rows must be evicted, removed=$removed")
      // only the most recent sentinel pair may still be retained: state is
      // bounded by the join window + disorder, not by stream length
      assert(stateRows <= 2, s"state must stay bounded, got $stateRows rows")
    } finally q.stop()
  }

  test("typed flatMapGroupsWithState sessionization carries state across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Streaming.Event]
    val q = Streaming.sessionize(mem.toDS(), 1800)
      .writeStream.format("memory").queryName("sess_typed")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString)
      .start()
    def ev(u: Long, id: Long, sec: Long) = Streaming.Event(u, id, new Timestamp(sec * 1000))
    try {
      // batch 1: two events of one session, out of order
      mem.addData(ev(1, 2, 1500), ev(1, 1, 1000))
      q.processAllAvailable()
      // batch 2: extends the same session (2500 < 1500 + 1800)
      mem.addData(ev(1, 3, 2500))
      q.processAllAvailable()
      // batch 3: far-future event for user 1 -> starts session B, and its
      // watermark (ts - 30 min disorder) passes session A's timeout
      mem.addData(ev(1, 4, 1000000))
      q.processAllAvailable()
      // batch 4: sentinel advances the watermark past session B's timeout
      mem.addData(ev(99, 9, 2000000))
      q.processAllAvailable()
      mem.addData(ev(98, 8, 3000000))
      q.processAllAvailable()
      val got = spark.table("sess_typed").as[Streaming.Session].collect().toSet
      assert(got.contains(Streaming.Session(1, 1000, 2500 + 1800, 3, 1, 3)), s"got $got")
      assert(got.contains(Streaming.Session(1, 1000000, 1000000 + 1800, 1, 4, 4)), s"got $got")
    } finally q.stop()
  }

  test("streaming CEP matches equal the batch tightest-chain operator") {
    val pattern = Seq("click", "view", "purchase")
    val evStream = Streaming.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.eventSeconds.as("tss"))
      .as[Streaming.PatternEvent]
    val streamed = Streaming.runToCompletion(
        Streaming.matchPattern(evStream, pattern, 86400).toDF(),
        org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(4))
      .select("user_id", "end_sec", "end_event", "span")
      .as[(Long, Long, Long, Long)].collect().toSet
    // batch operator, per-anchor rows before aggregation: recompute the
    // per-match set it aggregates from
    val batch = graft.operators.Patterns.sequenceMatches(
        Tables.events(spark, sf).select(col("user_id"), col("event_id"),
          col("event_type"), Tables.eventSeconds.as("tss")),
        pattern, 86400)
      .as[(Long, Long, Long, Long)].collect()
    assert(streamed.nonEmpty)
    // aggregate the streamed matches the same way and compare exactly
    val streamedAgg = streamed.groupBy(_._1).map { case (u, ms) =>
      val sorted = ms.toSeq.sortBy { case (_, end, id, _) => (end, id) }
      val (_, end, _, span) = sorted.head
      (u, ms.size.toLong, end, span)
    }.toSet
    assert(streamedAgg == batch.toSet)
  }
}
