package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.IvfIndex

/** The persisted IVF index must answer exactly like the recompute path
  * with the same seeds, keep old assignments frozen across appends, and
  * never expose an uncommitted generation.
  */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sf)
  private def oldVecs = corpus.filter(col("vec_id") % 50 =!= 0)
  private def delta = corpus.filter(col("vec_id") % 50 === 0)
  private def queries = corpus.filter(col("vec_id") < 8)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted

  test("full-corpus bootstrap answers identically to the recompute path") {
    val idx = new IvfIndex(spark, TempDirs.create("ivf-idx-spec"), nlist = 16)
    idx.bootstrap(corpus) // seeds = 16 lowest vec_ids overall, like ivfTopK
    val got = rows(idx.topK(corpus, queries, 5, nprobe = 4))
    val expected = rows(Similarity.ivfTopK(corpus, queries, 5, nlist = 16, nprobe = 4))
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("append assigns only the delta; frozen centroids keep old assignments byte-stable") {
    val idx = new IvfIndex(spark, TempDirs.create("ivf-idx-spec2"), nlist = 16)
    idx.bootstrap(oldVecs)
    assert(idx.committedGen === 0L)
    val before = idx.assignmentsDf.as[(Long, Long)].collect().toSeq.sorted
    idx.append(delta)
    assert(idx.committedGen === 1L)
    val after = idx.assignmentsDf.as[(Long, Long)].collect().toSeq.sorted
    // every vector assigned exactly once, old rows unchanged
    assert(after.map(_._1).distinct.length === after.length)
    assert(after.length === corpus.count())
    val afterOld = after.filter { case (id, _) => id % 50 != 0 }
    assert(afterOld === before)
  }

  test("appendBatch is exactly-once under redelivery and equals the batch append") {
    val idx = new IvfIndex(spark, TempDirs.create("ivf-idx-batch"), nlist = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    assert(idx.committedGen === 1L)
    val once = idx.assignmentsDf.as[(Long, Long)].collect().toSeq.sorted
    // foreachBatch redelivery of an applied batch must be a no-op
    idx.appendBatch(delta, batchId = 0L)
    assert(idx.committedGen === 1L)
    assert(idx.assignmentsDf.as[(Long, Long)].collect().toSeq.sorted === once)
    // streaming and batch ingest are indistinguishable to a reader
    val plain = new IvfIndex(spark, TempDirs.create("ivf-idx-batch2"), nlist = 16)
    plain.bootstrap(oldVecs)
    plain.append(delta)
    assert(plain.assignmentsDf.as[(Long, Long)].collect().toSeq.sorted === once)
  }

  test("an uncommitted generation directory is invisible to readers") {
    val dir = TempDirs.create("ivf-idx-spec3")
    val idx = new IvfIndex(spark, dir, nlist = 16)
    idx.bootstrap(oldVecs)
    val committed = idx.assignmentsDf.count()
    // simulate a crash mid-append: gen-1 parquet exists, watermark doesn't
    Seq((999999L, 0L)).toDF("vec_id", "cell")
      .write.mode("overwrite").parquet(s"$dir/gen-1")
    assert(idx.committedGen === 0L)
    assert(idx.assignmentsDf.count() === committed)
    // the next append overwrites the orphan and commits atomically
    idx.append(delta)
    assert(idx.committedGen === 1L)
    assert(idx.assignmentsDf.count() === corpus.count())
    assert(idx.assignmentsDf.filter(col("vec_id") === 999999L).count() === 0L)
  }

  test("bootstrap is idempotent; append before bootstrap refuses") {
    val idx = new IvfIndex(spark, TempDirs.create("ivf-idx-spec4"), nlist = 16)
    intercept[IllegalArgumentException] { idx.append(delta) }
    idx.bootstrap(oldVecs)
    val n = idx.assignmentsDf.count()
    idx.bootstrap(corpus) // second bootstrap must be a no-op
    assert(idx.committedGen === 0L)
    assert(idx.assignmentsDf.count() === n)
  }

  test("probe plan broadcasts the query side: stored assignments never shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val idx = new IvfIndex(spark, TempDirs.create("ivf-idx-spec5"), nlist = 16)
    idx.bootstrap(corpus)
    def collectRec[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect {
        case a: AdaptiveSparkPlanExec => collectRec(a.executedPlan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    val df = idx.topK(corpus, queries, 5, nprobe = 4)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val bhj = collectRec(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, df.queryExecution.executedPlan.toString.take(3000))
  }

  test("probe pushes the probed cells into the scan as an IN filter: base clustering prunes for real") {
    // a broadcast join on `cell` restricts rows only AFTER the scan —
    // Spark injects no row-group pruning from a join on a non-partition
    // column, so without the explicit IN filter the compacted
    // cell-clustered base is read in full and compact()'s pruning story
    // is fiction. The probe set is already driver metadata; the filter
    // must reach the parquet scan as PushedFilters: In(cell, ...).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val idx = new IvfIndex(spark, TempDirs.create("ivf-push"), nlist = 16)
    idx.bootstrap(corpus)
    idx.compact(retireSuperseded = true)
    def collectRec[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect {
        case a: AdaptiveSparkPlanExec => collectRec(a.executedPlan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    val df = idx.topK(corpus, queries, 5, nprobe = 4)
    df.write.format("noop").mode("overwrite").save()
    val baseScans = collectRec(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("base-")) => s
    }
    assert(baseScans.nonEmpty, "no scan over the compacted base found")
    baseScans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("In(cell"),
        s"probed cells not pushed to the base scan: PushedFilters=$pushed")
    }
  }

  test("compact folds generations into a cell-clustered base; probes and later appends unchanged") {
    val d0 = corpus.filter(col("vec_id") % 100 === 0)
    val d50 = corpus.filter(col("vec_id") % 100 === 50)
    val idx = new IvfIndex(spark, TempDirs.create("ivf-cmp"), nlist = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(d0, batchId = 0L)
    idx.compact()
    assert(idx.compactedThrough === 1L && idx.committedGen === 1L)
    idx.append(d50) // gen 2 on top of base-1
    val ref = new IvfIndex(spark, TempDirs.create("ivf-cmp-ref"), nlist = 16)
    ref.bootstrap(oldVecs)
    ref.append(delta)
    val expected = rows(ref.topK(corpus, queries, 5, nprobe = 4))
    assert(expected.nonEmpty)
    assert(rows(idx.topK(corpus, queries, 5, nprobe = 4)) === expected)
    // fold the tail generation too, retiring everything superseded —
    // the probe must answer from the base alone
    idx.compact(retireSuperseded = true)
    assert(idx.compactedThrough === 2L)
    assert(rows(idx.topK(corpus, queries, 5, nprobe = 4)) === expected)
    assert(idx.assignmentsDf.inputFiles.forall(_.contains("base-2")))
  }

  test("maintain commits the smallest clearing nprobe; the no-knobs topK reads it; reseed carries the commit") {
    val dir = TempDirs.create("ivf-maint")
    val idx = new IvfIndex(spark, dir, nlist = 16)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    assert(idx.operatingPoint.isEmpty)
    intercept[IllegalStateException] { idx.topK(corpus, queries, 5) }
    // maxFracBelow = 1.0 disables the guard for this test — it pins the
    // clean revalidate/commit path ([[IvfPqIndexSpec]]'s rule); the
    // fired-guard branches are pinned below
    val m = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16))
    assert(m.serving eq idx)
    val r = m.report.collect().head
    assert(r.getAs[String]("action") === "revalidate")
    assert(r.getAs[Boolean]("committed") === r.getAs[Boolean]("floor_cleared"))
    assert(r.getAs[Boolean]("floor_cleared"),
      "nprobe=16 probes every cell: in-cell scoring is exact, recall must be 1.0")
    val np = r.getAs[Int]("nprobe")
    assert(idx.operatingPoint === Some(np))
    assert(idx.operatingPointGen === Some(idx.committedGen))
    assert(rows(idx.topK(corpus, queries, 5)) ===
      rows(idx.topK(corpus, queries, 5, np)))
    // smallest-clearing: the sweep must not have skipped a clearing width
    val sweep = idx.revalidateNprobe(corpus, queries, 5, 0.9, Seq(1, 2, 4, 8, 16))
      .select(col("nprobe"), col("recall"), col("chosen"), col("floor_cleared"))
      .as[(Int, Double, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    assert(sweep.count(_._3) === 1)
    sweep.takeWhile(_._1 < np).foreach(s => assert(!s._4, s"skipped clearing row $s"))
    sweep.foreach(s => assert(s._4 === (s._2 >= 0.9)))
    // the stamp is store state: a reopen sees it
    assert(new IvfIndex(spark, dir, nlist = 16).operatingPoint === Some(np))
    // reseed branch: negated delta fires the guard; the fresh lineage
    // serves and carries the commit, the old root keeps its own stamp
    val shifted = delta.select(col("vec_id"),
      transform(col("embedding"), x => (-x).cast("float")).as("embedding"))
    val combined = oldVecs.select(col("vec_id"), col("embedding"))
      .unionByName(shifted)
    val m2 = idx.maintain(combined, shifted, combined.filter(col("vec_id") < 8),
      k = 5, recallFloor = 0.9, cosineFloor = 0.22, maxFracBelow = 0.5,
      nprobes = Seq(1, 2, 4, 8, 16),
      reseedDir = Some(TempDirs.create("ivf-maint-rs")))
    val r2 = m2.report.collect().head
    assert(r2.getAs[String]("action") === "reseed")
    assert(!(m2.serving eq idx))
    assert(idx.operatingPoint === Some(np), "old root's stamp must not move")
    if (r2.getAs[Boolean]("committed"))
      assert(m2.serving.operatingPoint === Some(r2.getAs[Int]("nprobe")))
  }

  test("maintain capacity branch: a sweep clearing only at the full coarse scan grows nlist and commits a pruned point") {
    // r13 verdict #2: the loop could only widen the probe, so a corpus
    // that outgrew its cells got nprobe == nlist — a full coarse scan —
    // committed as its "validated" point. A 2-cell index over the whole
    // corpus is exactly that shape: nprobe=1 misses the floor, nprobe=2
    // IS the full scan. maintain must read it as a CAPACITY signal (the
    // drift guard is structurally quiet at maxFracBelow = 1.0), rebuild
    // at the corpus-tracking Sizing.ivfNlist, and re-commit a point that
    // actually prunes.
    val idx = new IvfIndex(spark, TempDirs.create("ivf-grow-sm"), nlist = 2)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    val m = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16),
      reseedDir = Some(TempDirs.create("ivf-grow-new")), cellBudget = 64)
    val r = m.report.collect().head
    assert(r.getAs[String]("action") === "grow")
    val derived = Similarity.Sizing.ivfNlist(corpus.count(), 64)
    assert(derived > 2)
    assert(r.getAs[Int]("nlist") === derived)
    assert(m.serving.nlist === derived)
    assert(!(m.serving eq idx), "the grown lineage must serve")
    // the whole point: the post-grow committed point prunes again
    assert(r.getAs[Int]("nprobe") < derived,
      s"post-grow sweep still committed a full coarse scan: $r")
    assert(r.getAs[Boolean]("floor_cleared") && r.getAs[Boolean]("committed"))
    assert(m.serving.operatingPoint === Some(r.getAs[Int]("nprobe")))
    assert(idx.operatingPoint.isEmpty, "the old root must be untouched")
    assert(rows(m.serving.topK(corpus, queries, 5)).nonEmpty)
    // the same capacity signal with no reseedDir must say so — never a
    // silent "revalidate" a scheduler would read as health
    val due = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16),
      cellBudget = 64)
    assert(due.report.collect().head.getAs[String]("action") === "grow_due")
    assert(due.serving eq idx)
    // capacity fired with NO headroom (r14 ADVICE): at a huge budget the
    // derived nlist collapses to the current one — growing cannot help
    // even with a reseedDir, and the report must say so distinctly
    val spent = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16),
      reseedDir = Some(TempDirs.create("ivf-grow-noroom")),
      cellBudget = 1000000)
    val spentR = spent.report.collect().head
    assert(spentR.getAs[String]("action") === "capacity_exhausted")
    assert(spent.serving eq idx, "no rebuild without headroom")
    // legacy semantics: growth disabled at cellBudget = 0
    val legacy = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16))
    assert(legacy.report.collect().head.getAs[String]("action") === "revalidate")
    // a FIRED drift guard is never masked by the capacity signal: when
    // both fire with no reseedDir, the action stays reseed_due — the
    // drift rebuild it demands also fixes capacity (reseeds size by the
    // derived nlist), while grow_due would hide the drift signal
    val both = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 0.5, nprobes = Seq(1, 2, 4, 8, 16),
      cellBudget = 64)
    assert(both.report.collect().head.getAs[String]("action") === "reseed_due",
      "the drift signal must outrank the capacity signal")
  }

  test("distributed probe path: large batches match the broadcast path and never collect full-width probe rows") {
    // r14 verdict #1: topK collected |queries|*nprobe rows INCLUDING
    // query embeddings to the driver — metadata-sized for 8-query
    // fixtures, a driver OOM at production batch sizes. Above the
    // broadcast limit the only driver-side collect is the distinct cell
    // id set (O(nlist)); the probe frame stays a cached executor-side
    // relation joined on the cell key.
    val idx = new IvfIndex(spark, TempDirs.create("ivf-dist"), nlist = 16)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    // a replicated batch in a disjoint query-id space (no self-exclusion)
    val batch = corpus.crossJoin(spark.range(0, 5).select(col("id").as("rep")))
      .select((lit(1000000L) + col("vec_id") * 5 + col("rep")).as("vec_id"),
        col("embedding"))
    val viaBroadcast = rows(idx.topK(corpus, batch, 5, nprobe = 4,
      probeBroadcastLimit = Int.MaxValue))
    val distributed = idx.topK(corpus, batch, 5, nprobe = 4,
      probeBroadcastLimit = 1)
    assert(rows(distributed) === viaBroadcast,
      "the two probe modes must be result-identical")
    assert(viaBroadcast.nonEmpty)
    val plan = distributed.queryExecution.executedPlan.toString
    // the probe frame is the cached one-evaluation relation, not a
    // driver-collected LocalRelation...
    assert(plan.contains("InMemoryTableScan"),
      s"distributed probe must join the cached probe frame, got:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      "no driver-collected probe rows above the broadcast limit")
    // ...and the stored scan keeps its row-group pruning pushdown
    assert(plan.contains("In(cell"),
      s"cell IN pushdown must survive the distributed mode, got:\n$plan")
  }

  test("fragmentCount/compactionDue drive maintain's compaction; the fold is invisible to probes") {
    val d0 = corpus.filter(col("vec_id") % 100 === 0)
    val d50 = corpus.filter(col("vec_id") % 100 === 50)
    val idx = new IvfIndex(spark, TempDirs.create("ivf-cpol"), nlist = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(d0, batchId = 0L)
    idx.appendBatch(d50, batchId = 1L)
    assert(idx.fragmentCount === 3L)
    assert(idx.compactionDue(2) && !idx.compactionDue(3))
    val before = rows(idx.topK(corpus, queries, 5, nprobe = 4))
    val m = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(4, 16),
      compactAbove = 2)
    assert(m.report.collect().head.getAs[Boolean]("compacted"))
    assert(idx.fragmentCount === 1L)
    assert(idx.compactedThrough === idx.committedGen)
    assert(rows(idx.topK(corpus, queries, 5, nprobe = 4)) === before,
      "maintenance compaction must be invisible to probe results")
    // below threshold now: a second run reports no compaction
    val m2 = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(4, 16),
      compactAbove = 2)
    assert(!m2.report.collect().head.getAs[Boolean]("compacted"))
  }

  test("compact(retireSuperseded) honors the sweep even when the fold is a no-op") {
    // r13 ADVICE: the early return on g == compactedThrough silently
    // skipped a REQUESTED retirement — a prior no-retire compact's
    // superseded dirs leaked forever
    val root = TempDirs.create("ivf-retire")
    val idx = new IvfIndex(spark, root, nlist = 16)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    idx.compact() // fold without retiring: gen-0/gen-1 stay on disk
    def names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(names.exists(_.startsWith("gen-")))
    idx.compact(retireSuperseded = true) // no-op fold, real sweep
    assert(!names.exists(_.startsWith("gen-")),
      s"superseded generations leaked: $names")
    assert(idx.assignmentsDf.inputFiles.forall(_.contains("base-1")))
  }

  test("topKFresh refuses a stale or missing operating point and names the remedy") {
    // the operatingPointLag CONSUMER (r13 verdict #4): a point validated
    // before generations the probe would read is refused, never served
    val idx = new IvfIndex(spark, TempDirs.create("ivf-fresh"), nlist = 16)
    idx.bootstrap(oldVecs)
    intercept[IllegalStateException] { idx.topKFresh(corpus, queries, 5, maxLag = 0L) }
    idx.maintain(oldVecs, oldVecs.limit(0), queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16))
    assert(rows(idx.topKFresh(oldVecs, queries, 5, maxLag = 0L)).nonEmpty)
    idx.append(delta) // one generation past the stamp
    assert(idx.operatingPointLag === Some(1L))
    intercept[IllegalStateException] { idx.topKFresh(corpus, queries, 5, maxLag = 0L) }
    // an explicit staleness budget serves at the stamped point
    assert(rows(idx.topKFresh(corpus, queries, 5, maxLag = 1L)).nonEmpty)
  }

  test("reseedInto builds a fresh lineage; the old root is untouched and stays answerable") {
    val idx = new IvfIndex(spark, TempDirs.create("ivf-idx-rs-old"), nlist = 16)
    idx.bootstrap(oldVecs)
    val oldGen = idx.committedGen
    val oldAnswers = rows(idx.topK(oldVecs, queries, 5, nprobe = 4))
    val fresh = idx.reseedInto(TempDirs.create("ivf-idx-rs-new"), corpus)
    // the fresh index answers exactly like a from-scratch bootstrap over
    // the combined corpus (seeds drawn from the full corpus, not the old)
    val expected = rows(Similarity.ivfTopK(corpus, queries, 5, nlist = 16, nprobe = 4))
    assert(expected.nonEmpty)
    assert(rows(fresh.topK(corpus, queries, 5, nprobe = 4)) === expected)
    // cutover discipline: reseed never mutates the old root — readers of
    // the old lineage see byte-identical answers until the caller retires it
    assert(idx.committedGen === oldGen)
    assert(rows(idx.topK(oldVecs, queries, 5, nprobe = 4)) === oldAnswers)
  }
}
