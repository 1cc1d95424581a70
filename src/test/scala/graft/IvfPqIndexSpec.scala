package graft

import org.apache.spark.sql.functions._
import graft.sources.{IndexProbes, IvfIndex, IvfPqIndex, PqIndex}

/** The IVF-PQ composition must degrade to flat PQ when every cell is
  * probed, keep frozen-state purity across appends, and only ever score
  * probed cells' members.
  */
class IvfPqIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sf)
  private def oldVecs = corpus.filter(col("vec_id") % 50 =!= 0)
  private def delta = corpus.filter(col("vec_id") % 50 === 0)
  private def queries = corpus.filter(col("vec_id") < 8)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted

  test("probing every cell equals the flat-PQ index: cells only restrict candidates") {
    // nprobe = nlist makes the coarse quantizer a no-op — the composed
    // index must then answer exactly like PqIndex over the same training
    // corpus (cross-implementation equality of the whole ADC pipeline)
    val ivfpq = new IvfPqIndex(spark, TempDirs.create("ivfpq-spec"),
      nlist = 8, m = 8, codes = 16)
    ivfpq.bootstrap(corpus)
    val flat = new PqIndex(spark, TempDirs.create("ivfpq-spec-flat"),
      m = 8, codes = 16)
    flat.bootstrap(corpus)
    val got = rows(ivfpq.topK(corpus, queries, 5, shortlist = 20, nprobe = 8))
    val expected = rows(flat.topK(corpus, queries, 5, shortlist = 20))
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("restricted probing returns a subset with identical exact cosines") {
    val ivfpq = new IvfPqIndex(spark, TempDirs.create("ivfpq-spec2"),
      nlist = 16, m = 8, codes = 16)
    ivfpq.bootstrap(corpus)
    val wide = rows(ivfpq.topK(corpus, queries, 5, shortlist = 20, nprobe = 16))
      .map { case (q, n, c, _) => (q, n) -> c }.toMap
    val narrow = rows(ivfpq.topK(corpus, queries, 5, shortlist = 20, nprobe = 4))
    assert(narrow.nonEmpty)
    // every narrow-probe hit exists in the all-cells run with the same
    // exact re-rank cosine (fewer probes can only drop candidates)
    narrow.foreach { case (q, n, c, _) =>
      assert(wide.get((q, n)).forall(_ === c))
    }
  }

  test("distributed probe path: large batches match the broadcast path without a full-width collect") {
    // the composition's probe rows carry m*codes ADC tables (~16 KB
    // each) — the heaviest driver payload in the engine before r15's
    // threshold gate (r14 verdict #1/ADVICE). Above the limit the probe
    // frame stays executor-side and the re-rank's query join drops its
    // broadcast hint; results must be identical either way.
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-dist"),
      nlist = 16, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    val batch = corpus.crossJoin(spark.range(0, 3).select(col("id").as("rep")))
      .select((lit(1000000L) + col("vec_id") * 3 + col("rep")).as("vec_id"),
        col("embedding"))
    val viaBroadcast = rows(idx.topK(corpus, batch, 5, shortlist = 50,
      nprobe = 4, probeBroadcastLimit = Int.MaxValue))
    val distributed = idx.topK(corpus, batch, 5, shortlist = 50,
      nprobe = 4, probeBroadcastLimit = 1)
    assert(rows(distributed) === viaBroadcast)
    assert(viaBroadcast.nonEmpty)
    val plan = distributed.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "distributed probe must join the cached probe frame")
    assert(!plan.contains("LocalTableScan"),
      "no driver-collected probe rows above the broadcast limit")
    assert(plan.contains("In(cell"),
      "cell IN pushdown must survive the distributed mode")
    // r17 verdict #1: the distributed tier must never materialize the
    // m×codes ADC table — the attach build side stays embedding-width
    // and scoring is the direct kernel
    assert(plan.contains("pq_adc_dot"),
      "distributed scoring must use the direct ADC kernel")
    assert(!plan.contains("pq_qtab"),
      "no per-query ADC table may materialize in the distributed tier")
  }

  test("payload-aware broadcast tier: wide ADC rows cap below the row limit, narrow flat-IVF rows keep it") {
    // r15 ADVICE: BroadcastRowLimit is a row cutoff but the hazard is
    // bytes — at codes=256 each probe row carries a ~16 KB ADC table, so
    // 4096 rows would funnel ~64 MB through the driver collect +
    // broadcast. The effective tier is min(row cap, byte budget / row
    // bytes): the SAME probe-row count that broadcasts on the flat-IVF
    // store (0.5 KB rows) must take the distributed path on the
    // codes=256 composition (~2k-row byte cap).
    val wideRows = 8L * 8 * 256 + 64
    assert(IndexProbes.BroadcastByteBudget / wideRows < 4096,
      "fixture sanity: the wide-row byte cap must undercut the row cap")
    val pq = new IvfPqIndex(spark, TempDirs.create("ivfpq-bytes"),
      nlist = 16, m = 8, codes = 256)
    pq.bootstrap(oldVecs)
    pq.append(delta)
    val flat = new IvfIndex(spark, TempDirs.create("ivf-bytes"), nlist = 16)
    flat.bootstrap(oldVecs)
    flat.append(delta)
    // 2x-replicated batch: |queries| * nprobe = 4000 probe rows — under
    // the 4096 row cap (so the OLD threshold would broadcast the 64 MB)
    // but over the wide-row byte cap
    val batch = corpus.crossJoin(spark.range(0, 2).select(col("id").as("rep")))
      .select((lit(1000000L) + col("vec_id") * 2 + col("rep")).as("vec_id"),
        col("embedding"))
    assert(batch.count() * 4 < 4096 &&
      batch.count() * 4 > IndexProbes.BroadcastByteBudget / wideRows)
    val widePlan = pq.topK(corpus, batch, 5, shortlist = 50, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(widePlan.contains("InMemoryTableScan") &&
      !widePlan.contains("LocalTableScan"),
      s"wide ADC probe rows must take the distributed path, got:\n$widePlan")
    val narrowPlan = flat.topK(corpus, batch, 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(narrowPlan.contains("LocalTableScan") &&
      !narrowPlan.contains("InMemoryTableScan"),
      s"narrow flat-IVF probe rows at the same count must still broadcast, got:\n$narrowPlan")
  }

  test("append assigns+encodes only the delta; frozen state keeps old rows byte-stable") {
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-spec3"),
      nlist = 16, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    assert(idx.committedGen === 0L)
    val before = idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    idx.append(delta)
    assert(idx.committedGen === 1L)
    val after = idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    assert(after.map(_._1).distinct.length === after.length)
    assert(after.length === corpus.count())
    assert(after.filter { case (id, _, _) => id % 50 != 0 } === before)
  }

  test("appendBatch is exactly-once under redelivery and equals the batch append") {
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-spec5"),
      nlist = 16, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    assert(idx.committedGen === 1L)
    val once = idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    idx.appendBatch(delta, batchId = 0L) // redelivery must no-op
    assert(idx.committedGen === 1L)
    assert(idx.rowsDf.count() === once.length)
    val plain = new IvfPqIndex(spark, TempDirs.create("ivfpq-spec6"),
      nlist = 16, m = 8, codes = 16)
    plain.bootstrap(oldVecs)
    plain.append(delta)
    assert(plain.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1) === once)
  }

  test("bootstrap is idempotent; append before bootstrap refuses") {
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-spec4"),
      nlist = 16, m = 8, codes = 16)
    intercept[IllegalArgumentException] { idx.append(delta) }
    idx.bootstrap(oldVecs)
    val n = idx.rowsDf.count()
    idx.bootstrap(corpus) // second bootstrap must be a no-op
    assert(idx.committedGen === 0L)
    assert(idx.rowsDf.count() === n)
  }

  test("persisted-path recall tripwire: topK clears 0.9 at the stamped operating point through an appendBatch'd store") {
    // r12 verdict #1: the operator-level tripwire (SimilaritySpec) pins
    // Similarity.pqTopK, but the store path production serves — frozen
    // generation codebooks + stored codes + coarse probe — had no recall
    // assertion: a broken appendBatch delta-encode or a stale generation
    // read would ship exactly the way the 0.45 codebook did for two
    // rounds. This exercises the FULL store path: bootstrap on the
    // history, delta ingested via appendBatch (query 0 itself arrives in
    // the delta, so its encode rides the ledger path), probe settings =
    // the r12 declared operating point, fit params read back from the
    // StoreParams stamp — never re-typed constants.
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-recall"),
      nlist = 16, m = 8, codes = 256)
    idx.bootstrap(oldVecs) // iters = 2, the declared point's training depth
    idx.appendBatch(delta, batchId = 0L)
    val p = idx.fittedParams
    assert(p === Map("nlist" -> 16L, "m" -> 8L, "codes" -> 256L),
      s"store was fit at $p, not the declared r12 operating point")
    val k = 5
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = sets(graft.operators.Similarity.bruteForceTopK(corpus, queries, k))
    val ann = sets(idx.topK(corpus, queries, k, shortlist = 200, nprobe = 8))
    val recall = exact.map { case (q, ex) =>
      ann.getOrElse(q, Set.empty[Long]).count(ex).toDouble / ex.size
    }.sum / exact.size
    info(f"IVF-PQ store recall@$k = $recall%.2f")
    assert(recall >= 0.9,
      f"persisted IVF-PQ recall@$k degraded to $recall%.2f at the stamped point")
  }

  test("revalidateOperatingPoint executes the smallest-clearing rule and never picks silently") {
    // r12 verdict #2: BASELINE.md's manual re-validation rule ("smallest
    // nprobe whose recall clears the floor, then the smallest shortlist
    // that matches") as an executable maintenance operator. The spec pins
    // the CONTRACT, not fixture-specific recall values: smallest-clearing
    // choice per phase, one chosen row per phase, and the no-clearing
    // case marked visibly instead of silently picking.
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-reval"),
      nlist = 16, m = 8, codes = 256)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    val floor = 0.9
    val rows = idx.revalidateOperatingPoint(corpus, queries, k = 5,
        recallFloor = floor, nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 200))
      .select(col("phase"), col("nprobe"), col("shortlist"), col("recall"),
        col("chosen"), col("floor_cleared"))
      .as[(String, Int, Int, Double, Boolean, Boolean)].collect().toSeq
    val p1 = rows.filter(_._1 == "nprobe").sortBy(_._2)
    val p2 = rows.filter(_._1 == "shortlist").sortBy(_._3)
    assert(p1.map(_._2) === Seq(1, 4, 8, 16) && p1.forall(_._3 == 200))
    assert(p2.map(_._3) === Seq(20, 200))
    assert(p1.count(_._5) === 1 && p2.count(_._5) === 1)
    // floor_cleared must agree with the row's own recall
    rows.foreach(r => assert(r._6 === (r._4 >= floor)))
    // smallest-clearing: every row BEFORE the chosen one failed the floor
    val cnp = p1.find(_._5).get
    p1.takeWhile(_._2 < cnp._2).foreach(r => assert(!r._6, s"skipped clearing row $r"))
    if (p1.exists(_._6)) assert(cnp._6, "a clearing nprobe existed but was not chosen")
    val csl = p2.find(_._5).get
    assert(p2.forall(_._2 == cnp._2), "phase 2 must hold the chosen nprobe")
    p2.takeWhile(_._3 < csl._3).foreach(r => assert(!r._6, s"skipped clearing row $r"))
    // the chosen point reproduces its reported recall through the store
    import graft.operators.Similarity
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = sets(Similarity.bruteForceTopK(corpus, queries, 5))
    val got = sets(idx.topK(corpus, queries, 5, csl._3, cnp._2))
    val re = exact.map { case (q, ex) =>
      got.getOrElse(q, Set.empty[Long]).count(ex).toDouble / ex.size
    }.sum / exact.size
    assert(math.abs(re - csl._4) < 1e-9 + 5e-5, s"sweep said ${csl._4}, store gives $re")

    // no-clearing case: a single too-narrow setting must still be CHOSEN
    // (the caller needs a row to act on) but marked floor_cleared=false
    // unless it genuinely clears — never a silent pick
    val tight = idx.revalidateOperatingPoint(corpus, queries, k = 5,
        recallFloor = 1.0, nprobes = Seq(1), shortlists = Seq(5))
      .select(col("phase"), col("recall"), col("chosen"), col("floor_cleared"))
      .as[(String, Double, Boolean, Boolean)].collect().toSeq
    assert(tight.size === 2 && tight.forall(_._3))
    tight.foreach(r => assert(r._4 === (r._2 >= 1.0)))
  }

  test("maintain commits the chosen point; the no-knobs topK reads it; it survives reopen") {
    // r13: the loop closes — the sweep's choice must land where queries
    // look. Before any maintenance run the no-knobs probe REFUSES (never
    // guesses a point); after one, it probes exactly the committed
    // (nprobe, shortlist) and a reopened store sees the same stamp.
    val dir = TempDirs.create("ivfpq-maint")
    val idx = new IvfPqIndex(spark, dir, nlist = 16, m = 8, codes = 256)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    assert(idx.operatingPoint.isEmpty)
    intercept[IllegalStateException] { idx.topK(corpus, queries, 5) }
    // maxFracBelow = 1.0 disables the guard (frac can never exceed it):
    // this test pins the clean revalidate/commit path; the fired-guard
    // branches (reseed, reseed_due) have their own test below
    val m = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0,
      nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 200))
    assert(m.serving eq idx, "an unfired guard must not trigger a rebuild")
    val r = m.report.collect().head
    assert(r.getAs[String]("action") === "revalidate")
    assert(r.getAs[Boolean]("committed") === r.getAs[Boolean]("floor_cleared"))
    assert(r.getAs[Boolean]("floor_cleared"),
      "the fixture corpus clears 0.9 at the declared sweep (recall tripwire pins this)")
    val (np, sl) = (r.getAs[Int]("nprobe"), r.getAs[Int]("shortlist"))
    assert(idx.operatingPoint === Some((np, sl)))
    assert(idx.operatingPointGen === Some(idx.committedGen))
    assert(idx.operatingPointLag === Some(0L))
    assert(rows(idx.topK(corpus, queries, 5)) ===
      rows(idx.topK(corpus, queries, 5, sl, np)))
    // the stamp is store state, not object state: a reopen sees it
    val reopened = new IvfPqIndex(spark, dir, nlist = 16, m = 8, codes = 256)
    assert(reopened.operatingPoint === Some((np, sl)))
    // staleness is observable: an ingest after the sweep raises the lag
    idx.appendBatch(delta.limit(1), batchId = 1L)
    assert(idx.operatingPointLag === Some(1L))
  }

  test("maintain reseed branch: a shifted delta fires the guard, the fresh lineage serves and carries the commit") {
    val old = new IvfPqIndex(spark, TempDirs.create("ivfpq-maint-rs"),
      nlist = 16, m = 8, codes = 256)
    old.bootstrap(oldVecs)
    // negated embeddings: best-seed cosine flips sign, so a row stays
    // above the floor only when some seed scored <= -floor against the
    // ORIGINAL — rare; the majority of the delta lands below and the
    // guard fires at maxFracBelow = 0.5
    val shifted = delta.select(col("vec_id"),
      transform(col("embedding"), x => (-x).cast("float")).as("embedding"))
    val combined = oldVecs.select(col("vec_id"), col("embedding"))
      .unionByName(shifted)
    val m = old.maintain(combined, shifted, combined.filter(col("vec_id") < 8),
      k = 5, recallFloor = 0.9, cosineFloor = 0.22, maxFracBelow = 0.5,
      nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 200),
      reseedDir = Some(TempDirs.create("ivfpq-maint-rs-new")))
    val r = m.report.collect().head
    assert(r.getAs[String]("action") === "reseed")
    assert(r.getAs[Double]("frac_below") > 0.5)
    assert(!(m.serving eq old), "the fresh lineage must serve after a reseed")
    // the commit lands on the SERVING lineage; the old root is untouched
    assert(old.operatingPoint.isEmpty)
    assert(r.getAs[Boolean]("committed") === r.getAs[Boolean]("floor_cleared"))
    if (r.getAs[Boolean]("committed")) {
      val (np, sl) = (r.getAs[Int]("nprobe"), r.getAs[Int]("shortlist"))
      assert(m.serving.operatingPoint === Some((np, sl)))
      assert(rows(m.serving.topK(combined,
        combined.filter(col("vec_id") < 8), 5)).nonEmpty)
    }
    // the same fired guard WITHOUT a reseedDir must say so — never a
    // silent "revalidate" a scheduler would read as health
    val noDir = old.maintain(combined, shifted,
      combined.filter(col("vec_id") < 8), k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 0.5,
      nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 200))
    assert(noDir.report.collect().head.getAs[String]("action") === "reseed_due")
    assert(noDir.serving eq old)
  }

  test("maintain over an EMPTY delta is a clean revalidate, never a crash") {
    // a scheduled era-boundary run with no ingest since the last era is
    // a normal condition: driftReport yields NULL columns over zero rows
    // and maintain must fall through to the revalidate path
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-maint-empty"),
      nlist = 16, m = 8, codes = 256)
    idx.bootstrap(corpus)
    val m = idx.maintain(corpus, delta.filter(lit(false)), queries,
      k = 5, recallFloor = 0.9, cosineFloor = 0.22, maxFracBelow = 0.5,
      nprobes = Seq(8, 16), shortlists = Seq(20, 200))
    val r = m.report.collect().head
    assert(r.getAs[String]("action") === "revalidate")
    assert(r.getAs[Long]("n_vectors") === 0L)
    assert(r.getAs[Long]("n_below") === 0L)
    assert(r.getAs[Double]("frac_below") === 0.0)
    assert(m.serving eq idx)
  }

  test("maintain never commits a point that fails the floor; the standing point survives") {
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-maint-fl"),
      nlist = 16, m = 8, codes = 256)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    val ok = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 0.5,
      nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 200))
    val standing = idx.operatingPoint
    assert(standing.isDefined)
    // an unclearable sweep (floor 1.0 at one starved setting) must report
    // floor_cleared=false, commit nothing, and leave the old point intact
    val bad = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 1.0,
      cosineFloor = 0.22, maxFracBelow = 0.5,
      nprobes = Seq(1), shortlists = Seq(5))
    val r = bad.report.collect().head
    if (!r.getAs[Boolean]("floor_cleared")) {
      assert(!r.getAs[Boolean]("committed"))
      assert(idx.operatingPoint === standing,
        "a failed sweep must not move the committed point")
    } else cancel("fixture cleared recall 1.0 at (nprobe=1, shortlist=5); " +
      "pick a narrower starved setting")
    assert(ok.report.collect().head.getAs[Boolean]("committed"))
  }

  test("maintain capacity branch: the composition grows nlist (seeds AND codebooks retrained) and commits a pruned point") {
    // the r13 10x rehearsal failure shape: a sweep whose only clearing
    // setting is nprobe == nlist. The 2-cell composition reproduces it at
    // suite scale; maintain must grow to Sizing.ivfNlist and the
    // post-grow point must prune (nprobe < nlist). Floor 0.85 leaves
    // headroom for ADC quantization noise on the shortlist boundary —
    // the claim pinned here is the capacity DECISION, not a recall SLA
    // (the recall tripwires pin that at the declared operating point).
    val idx = new graft.sources.IvfPqIndex(
      spark, TempDirs.create("ivfpq-grow"), nlist = 2, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    val m = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.85,
      cosineFloor = 0.22, maxFracBelow = 1.0,
      nprobes = Seq(1, 2, 4, 8, 16), shortlists = Seq(200),
      reseedDir = Some(TempDirs.create("ivfpq-grow-new")), cellBudget = 64)
    val r = m.report.collect().head
    assert(r.getAs[String]("action") === "grow")
    val derived = graft.operators.Similarity.Sizing.ivfNlist(corpus.count(), 64)
    assert(derived > 2 && r.getAs[Int]("nlist") === derived)
    assert(m.serving.nlist === derived)
    assert(!(m.serving eq idx))
    assert(r.getAs[Int]("nprobe") < derived,
      s"post-grow sweep still committed a full coarse scan: $r")
    if (r.getAs[Boolean]("committed")) {
      assert(m.serving.operatingPoint ===
        Some((r.getAs[Int]("nprobe"), r.getAs[Int]("shortlist"))))
      assert(rows(m.serving.topK(corpus, queries, 5)).nonEmpty)
    }
    assert(idx.operatingPoint.isEmpty, "the old root must be untouched")
    // unactionable capacity signal is surfaced, never silent
    val due = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.85,
      cosineFloor = 0.22, maxFracBelow = 1.0,
      nprobes = Seq(1, 2, 4, 8, 16), shortlists = Seq(200), cellBudget = 64)
    assert(due.report.collect().head.getAs[String]("action") === "grow_due")
    // capacity fired with NO headroom (r14 ADVICE): at a huge budget the
    // derived nlist collapses to the current one — growing cannot help
    // even with a reseedDir, and the report must say so distinctly
    val spent = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.85,
      cosineFloor = 0.22, maxFracBelow = 1.0,
      nprobes = Seq(1, 2, 4, 8, 16), shortlists = Seq(200),
      reseedDir = Some(TempDirs.create("ivfpq-grow-noroom")),
      cellBudget = 1000000)
    val spentR = spent.report.collect().head
    assert(spentR.getAs[String]("action") === "capacity_exhausted")
    assert(spent.serving eq idx, "no rebuild without headroom")
  }

  test("maintain(compactAbove) folds the fragments once; a repeat reports the fold as a no-op") {
    // r14 verdict #7's replay assertion: maintain() is stateful — the
    // era run folds and says so; a SECOND run on the same store finds
    // the layout already folded and must report compacted=false (the
    // declared ivfpq_maintain query sidesteps order-dependence by
    // rebuilding its store per execution — this pins the operator rule)
    val d0 = corpus.filter(col("vec_id") % 100 === 0)
    val d50 = corpus.filter(col("vec_id") % 100 === 50)
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-cpol"),
      nlist = 16, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(d0, batchId = 0L)
    idx.appendBatch(d50, batchId = 1L)
    assert(idx.fragmentCount === 3L)
    val before = rows(idx.topK(corpus, queries, 5, shortlist = 50, nprobe = 4))
    val m = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.85,
      cosineFloor = 0.22, maxFracBelow = 1.0,
      nprobes = Seq(4, 16), shortlists = Seq(200), compactAbove = 2)
    assert(m.report.collect().head.getAs[Boolean]("compacted"))
    assert(idx.fragmentCount === 1L && idx.compactedThrough === idx.committedGen)
    assert(rows(idx.topK(corpus, queries, 5, shortlist = 50, nprobe = 4)) === before,
      "maintenance compaction must be invisible to probe results")
    val m2 = idx.maintain(corpus, delta, queries, k = 5, recallFloor = 0.85,
      cosineFloor = 0.22, maxFracBelow = 1.0,
      nprobes = Seq(4, 16), shortlists = Seq(200), compactAbove = 2)
    assert(!m2.report.collect().head.getAs[Boolean]("compacted"),
      "a second maintain on the same store must report the fold as a no-op")
  }

  test("compact folds generations into a cell-clustered base; probes, later appends, and retirement stay invisible") {
    // r13: the read-amplification half of maintenance. Streaming ingest
    // leaves one dir per micro-batch; compact() folds the committed view
    // into one base dir clustered on the cell id. Everything observable
    // must be unchanged: probe results, row content, the ability to keep
    // appending on top of the base — and retiring the superseded dirs
    // must prove the probe really reads only the base.
    val d0 = corpus.filter(col("vec_id") % 100 === 0)
    val d50 = corpus.filter(col("vec_id") % 100 === 50)
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-cmp"),
      nlist = 16, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(d0, batchId = 0L)
    assert(idx.compactedThrough === -1L)
    val preRows = idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    idx.compact()
    assert(idx.compactedThrough === 1L && idx.committedGen === 1L)
    assert(idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1) === preRows)
    // appends keep working on top of the base (gen 2 over base-1)
    idx.append(d50)
    assert(idx.committedGen === 2L && idx.compactedThrough === 1L)
    val ref = new IvfPqIndex(spark, TempDirs.create("ivfpq-cmp-ref"),
      nlist = 16, m = 8, codes = 16)
    ref.bootstrap(oldVecs)
    ref.append(delta)
    val expected = rows(ref.topK(corpus, queries, 5, shortlist = 20, nprobe = 4))
    assert(rows(idx.topK(corpus, queries, 5, shortlist = 20, nprobe = 4))
      === expected)
    // recompact folding the post-base generation, retiring every
    // superseded dir — the probe must now answer from the base alone
    idx.compact(retireSuperseded = true)
    assert(idx.compactedThrough === 2L)
    val dirNames = new java.io.File(
      idx.rowsDf.inputFiles.head.stripPrefix("file:")).getParentFile
      .getParentFile.listFiles().map(_.getName).toSet
    assert(dirNames.contains("base-2"))
    assert(!dirNames.exists(_.startsWith("gen-")), s"superseded dirs survive: $dirNames")
    assert(!dirNames.contains("base-1"))
    assert(rows(idx.topK(corpus, queries, 5, shortlist = 20, nprobe = 4))
      === expected)
    // compacting an already-folded head is a no-op
    idx.compact()
    assert(idx.compactedThrough === 2L)
  }

  test("probe pushes the probed cells into the scan as an IN filter: base clustering prunes for real") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val idx = new IvfPqIndex(spark, TempDirs.create("ivfpq-push"),
      nlist = 16, m = 8, codes = 16)
    idx.bootstrap(corpus)
    idx.compact(retireSuperseded = true)
    def collectRec[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect {
        case a: AdaptiveSparkPlanExec => collectRec(a.executedPlan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    val df = idx.topK(corpus, queries, 5, shortlist = 20, nprobe = 4)
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

  test("a crashed compact (base written, slot not committed) is invisible") {
    val dir = TempDirs.create("ivfpq-cmp-crash")
    val idx = new IvfPqIndex(spark, dir, nlist = 16, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.append(delta)
    val before = idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    // simulate the crash: the staging base dir exists with garbage rows,
    // but the `base` slot never renamed in
    idx.rowsDf.limit(3)
      .write.mode("overwrite").parquet(s"$dir/base-1")
    assert(idx.compactedThrough === -1L)
    assert(idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1) === before)
    // a re-run overwrites the orphan staging dir and commits atomically
    idx.compact()
    assert(idx.compactedThrough === 1L)
    assert(idx.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1) === before)
  }

  test("reseedInto retrains seeds AND codebooks; the old root stays readable unchanged") {
    val old = new IvfPqIndex(spark, TempDirs.create("ivfpq-rs-old"),
      nlist = 16, m = 8, codes = 16)
    old.bootstrap(oldVecs)
    val oldRows = old.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    val oldProbe = rows(old.topK(oldVecs, queries, 5, shortlist = 20, nprobe = 4))

    val fresh = old.reseedInto(TempDirs.create("ivfpq-rs-new"), corpus)
    // the fresh lineage IS a full retrain: identical by construction to a
    // straight bootstrap over the combined corpus (deterministic seeds +
    // deterministic Lloyd), which pins that codebooks were re-trained on
    // the new distribution rather than copied from the old root
    val ref = new IvfPqIndex(spark, TempDirs.create("ivfpq-rs-ref"),
      nlist = 16, m = 8, codes = 16)
    ref.bootstrap(corpus)
    assert(fresh.committedGen === 0L)
    assert(rows(fresh.topK(corpus, queries, 5, shortlist = 20, nprobe = 4)) ===
      rows(ref.topK(corpus, queries, 5, shortlist = 20, nprobe = 4)))
    // codebooks genuinely differ between the lineages (different training
    // corpora), so the fresh index is not a re-labeled copy
    val oldCodes = oldRows.map(r => r._1 -> r._3).toMap
    val freshCodes = fresh.rowsDf.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(oldCodes.exists { case (id, c) => freshCodes.get(id).exists(_ != c) })

    // as-of isolation: the old root is byte-identical and still answers
    assert(old.rowsDf.select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])].collect().toSeq.sortBy(_._1) === oldRows)
    assert(rows(old.topK(oldVecs, queries, 5, shortlist = 20, nprobe = 4)) ===
      oldProbe)
    // and the drift report runs on both lineages (two phases, one row each)
    assert(old.driftReport(delta, 0.22, 0.25).count() === 1L)
    assert(fresh.driftReport(delta, 0.22, 0.25).count() === 1L)
  }
}
