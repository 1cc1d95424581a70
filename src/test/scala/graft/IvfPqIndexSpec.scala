package graft

import org.apache.spark.sql.functions._
import graft.sources.{IvfPqIndex, PqIndex}

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
