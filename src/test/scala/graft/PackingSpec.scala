package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Packing

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("shards fill by exclusive prefix: a doc starting inside shard N stays in N") {
    val docs = Seq((1L, 6L), (2L, 3L), (3L, 3L), (4L, 10L), (5L, 1L))
      .toDF("doc_id", "n_tok")
    // budget 8: prefixes 0,6,9,12,22 -> shards 0,0,1,1,2
    val got = Packing.tokenShards(docs, "doc_id", "n_tok", 8L, ranges = 2)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("two-level prefix equals the single-window formulation exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val got = Packing.tokenShards(docs, "doc_id", "n_tok", 4096L)
      .select("doc_id", "shard_id")
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("_pre", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("shard_id", expr("_pre DIV 4096"))
      .select("doc_id", "shard_id")
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("no shard overfills by more than one document") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val budget = 2048L
    val maxDoc = docs.agg(max("n_tok")).as[Long].head()
    val shards = Packing.tokenShards(docs, "doc_id", "n_tok", budget)
      .groupBy("shard_id").agg(sum("n_tok").as("toks"))
    val over = shards.where(col("toks") > budget + maxDoc).count()
    assert(over == 0, s"a shard exceeded budget + one document")
    // all but the last shard reach the budget
    val lastShard = shards.agg(max("shard_id")).as[Long].head()
    val under = shards.where(col("shard_id") =!= lastShard && col("toks") < budget - maxDoc)
      .count()
    assert(under == 0, "a non-final shard fell more than one document short")
  }

  test("sequence packing: pieces tile each document and fill every non-final sequence exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val seqLen = 128L
    val pieces = Packing.packSequences(docs, "doc_id", "n_tok", seqLen)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(pieces.nonEmpty)
    // per-doc piece lengths sum to the doc's token count
    val perDoc = pieces.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val want = docs.filter(col("n_tok") > 0).as[(Long, Long)].collect().toMap
    assert(perDoc == want)
    // every sequence except the last is filled to exactly seqLen
    val perSeq = pieces.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (s, tot) =>
      if (s != lastSeq) assert(tot == seqLen, s"sequence $s holds $tot tokens")
      else assert(tot <= seqLen)
    }
    // pieces are within bounds and non-degenerate
    pieces.foreach { case (d, s, off, len) =>
      assert(off >= 0 && off < seqLen && len >= 1 && off + len <= seqLen,
        s"bad piece ($d, $s, $off, $len)")
    }
    // a zero-token document contributes nothing
    val withEmpty = Seq((1L, 3L), (2L, 0L), (3L, 2L)).toDF("doc_id", "n_tok")
    val p2 = Packing.packSequences(withEmpty, "doc_id", "n_tok", 4L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(p2 == Seq((1L, 0L, 0L, 3L), (3L, 0L, 3L, 1L), (3L, 1L, 0L, 1L)))
  }

  test("incremental packing is indistinguishable from a full repack, at any split point") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val full = Packing.packSequences(docs, "doc_id", "n_tok", 128L)
    Seq(0L, 100L, 490L) foreach { cutoff =>
      val prior = docs.filter(col("doc_id") < cutoff)
        .agg(coalesce(sum(col("n_tok")), lit(0L))).head().getLong(0)
      val incr = Packing.packSequencesIncremental(
        docs.filter(col("doc_id") >= cutoff), "doc_id", "n_tok", 128L, prior)
      val want = full.filter(col("doc_id") >= cutoff)
      assert(incr.except(want).isEmpty && want.except(incr).isEmpty, s"cutoff $cutoff")
    }
    // empty delta packs to nothing
    val allTok = docs.agg(sum(col("n_tok"))).head().getLong(0)
    assert(Packing.packSequencesIncremental(
      docs.filter(col("doc_id") < 0), "doc_id", "n_tok", 128L, allTok).count() == 0L)
  }

  test("length-bucketed batches equal the single-window formulation; waste bounded") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val got = Packing.lengthBucketBatches(docs, "doc_id", "n_tok",
      bucketWidth = 16, batchSize = 8, ranges = 4)
    val want = docs
      .withColumn("bucket", expr("n_tok DIV 16"))
      .withColumn("batch", expr("(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) DIV 8"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n"), max(col("n_tok")).as("mx"),
        sum(col("n_tok")).as("s"))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_batches"),
        sum(col("s")).as("tok_total"),
        sum(col("mx") * col("n") - col("s")).as("pad_total"))
      .withColumn("fill_ratio",
        round(col("tok_total") / (col("tok_total") + col("pad_total")), 4))
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // bucket membership bounds any batch's per-row padding below the width
    val worst = got.select(max(col("pad_total") / col("n_docs"))).head().getDouble(0)
    assert(worst < 16.0, s"per-doc padding $worst >= bucketWidth")
  }

  test("assignment frame: single-window equivalence, batch sizes, and exact re-aggregation to the report") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val got = Packing.lengthBucketAssignments(docs, "doc_id", "n_tok",
      bucketWidth = 16, batchSize = 8, ranges = 4)
      .select(col("doc_id"), col("n_tok"), col("bucket"), col("batch_in_bucket"))
    // bit-identical to the single-window formulation, per document
    val want = docs
      .withColumn("bucket", expr("n_tok DIV 16"))
      .withColumn("batch_in_bucket",
        expr("(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) DIV 8"))
    assert(got.count() == docs.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // every batch except a bucket's last is exactly full
    val sizes = got.groupBy(col("bucket"), col("batch_in_bucket"))
      .agg(count(lit(1)).as("n"), max(col("batch_in_bucket")).as("b"))
    val lastPerBucket = got.groupBy(col("bucket"))
      .agg(max(col("batch_in_bucket")).as("last_b"))
    val nonLast = sizes.join(lastPerBucket, Seq("bucket"))
      .filter(col("batch_in_bucket") < col("last_b"))
    assert(nonLast.filter(col("n") =!= 8).isEmpty, "non-final batch not full")
    // the padding report IS this frame re-aggregated — they cannot drift
    val report = Packing.lengthBucketBatches(docs, "doc_id", "n_tok",
      bucketWidth = 16, batchSize = 8, ranges = 4)
    val fromAssign = got
      .groupBy(col("bucket"), col("batch_in_bucket"))
      .agg(count(lit(1)).as("n"), max(col("n_tok")).as("mx"), sum(col("n_tok")).as("s"))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_batches"),
        sum(col("s")).as("tok_total"),
        sum(col("mx") * col("n") - col("s")).as("pad_total"))
      .withColumn("fill_ratio",
        when(col("tok_total") + col("pad_total") === 0, lit(null).cast("double"))
          .otherwise(round(col("tok_total") / (col("tok_total") + col("pad_total")), 4)))
    assert(report.except(fromAssign).isEmpty && fromAssign.except(report).isEmpty)
  }

  test("length-bucketed batches: zero-token docs get a null fill ratio, not 0/0") {
    val docs = Seq((1L, 0L), (2L, 0L), (3L, 20L)).toDF("doc_id", "n_tok")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "n_tok", 16, 8, ranges = 2)
      .orderBy("bucket")
      .select("bucket", "n_docs", "n_batches", "pad_total")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1L, 0L), (1L, 1L, 1L, 0L)))
  }

  test("the plan never funnels the corpus through a single partition") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(GraftFunctions.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val plan = Packing.tokenShards(docs, "doc_id", "n_tok", 4096L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition") || !plan.contains("Window"),
      s"global-window funnel in plan:\n$plan")
    assert("Exchange hashpartitioning\\(_rid".r.findFirstIn(plan).isDefined,
      s"expected the per-range window exchange:\n$plan")
    // batch_padding: the within-bucket row numbering must window per
    // (bucket, range) cell, never per bucket alone (the dominant length
    // class would be a single task) and never globally
    val bp = Packing.lengthBucketBatches(docs, "doc_id", "n_tok", 16, 8)
      .queryExecution.executedPlan.toString
    assert(!bp.contains("Exchange SinglePartition") || !bp.contains("Window"),
      s"global-window funnel in batch plan:\n$bp")
    assert("Exchange hashpartitioning\\(_bucket[#0-9L]*, _rid".r.findFirstIn(bp).isDefined,
      s"expected the per-(bucket, range) window exchange:\n$bp")
  }
}
