package graft

import org.apache.spark.sql.functions._
import graft.operators.Fleet
import graft.sources.{InvertedIndex, IvfIndex, IvfPqIndex, LshBandIndex, PqIndex}

/** The fleet maintenance walk (r14 verdict next-round #5) must carry the
  * right flags for a store in each lifecycle state — fresh, stale,
  * never-maintained, fragmented — and its fragment arithmetic must match
  * the generational layout of every store family.
  */
class FleetSpec extends SparkSuite {

  private def corpus = Tables.embeddings(spark, sf)
  private def hist = corpus.filter(col("vec_id") % 50 =!= 0)
  private def delta = corpus.filter(col("vec_id") % 50 === 0)
  private def queries = corpus.filter(col("vec_id") < 8)

  test("fresh, stale, never-maintained, and fragmented stores each carry the right flags") {
    val fresh = new IvfIndex(spark, TempDirs.create("fleet-fresh"), nlist = 16)
    fresh.bootstrap(hist)
    fresh.maintain(hist, hist.limit(0), queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16))
    val stale = new IvfIndex(spark, TempDirs.create("fleet-stale"), nlist = 16)
    stale.bootstrap(hist)
    stale.maintain(hist, hist.limit(0), queries, k = 5, recallFloor = 0.9,
      cosineFloor = 0.22, maxFracBelow = 1.0, nprobes = Seq(1, 2, 4, 8, 16))
    stale.append(delta) // one ingest past the stamp: the point is stale
    val never = new IvfPqIndex(spark, TempDirs.create("fleet-never"),
      nlist = 8, m = 8, codes = 16)
    never.bootstrap(hist) // point-serving family, no point ever committed
    val frag = new PqIndex(spark, TempDirs.create("fleet-frag"),
      m = 8, codes = 16)
    frag.bootstrap(hist)
    frag.appendBatch(delta.filter(col("vec_id") % 100 === 0), batchId = 0L)
    frag.appendBatch(delta.filter(col("vec_id") % 100 === 50), batchId = 1L)

    val by = Fleet.report(spark,
        Seq(("fresh", fresh), ("stale", stale), ("never", never),
          ("frag", frag)),
        maxLag = 0L, maxFragments = 2)
      .collect().map(r => r.getAs[String]("store") -> r).toMap

    val f = by("fresh")
    assert(!f.getAs[Boolean]("maintenance_due") &&
      !f.getAs[Boolean]("point_stale") && !f.getAs[Boolean]("compaction_due"))
    assert(f.getAs[Long]("lag") === 0L && f.getAs[Long]("fragments") === 1L)
    assert(f.getAs[Int]("nprobe") === fresh.operatingPoint.get)

    val st = by("stale")
    assert(st.getAs[Boolean]("point_stale") && st.getAs[Boolean]("maintenance_due"))
    assert(st.getAs[Long]("lag") === 1L)
    assert(!st.getAs[Boolean]("compaction_due"),
      "two fragments at maxFragments = 2 is not compaction-due")

    val nv = by("never")
    assert(nv.getAs[Boolean]("maintenance_due"),
      "a point-serving store with no committed point has never been maintained")
    assert(!nv.getAs[Boolean]("point_stale") && !nv.getAs[Boolean]("compaction_due"))
    assert(nv.isNullAt(nv.fieldIndex("op_gen")) && nv.isNullAt(nv.fieldIndex("lag")))

    val fr = by("frag")
    assert(fr.getAs[String]("kind") === "pq")
    assert(fr.getAs[Long]("fragments") === 3L)
    assert(fr.getAs[Boolean]("compaction_due") && fr.getAs[Boolean]("maintenance_due"))
    assert(!fr.getAs[Boolean]("point_stale"),
      "a family without point semantics is never point-stale or " +
        "never-maintained — fragmentation is its only due signal")

    // compaction folds the fragmented store back to healthy
    frag.compact()
    val after = Fleet.report(spark, Seq(("frag", frag)), 0L, 2).collect().head
    assert(after.getAs[Long]("fragments") === 1L)
    assert(!after.getAs[Boolean]("compaction_due") &&
      !after.getAs[Boolean]("maintenance_due"))
  }

  test("inverted/lsh fragment arithmetic matches the generational layout") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val cut = 250L
    val inv = new InvertedIndex(spark, TempDirs.create("fleet-spec-inv"))
    inv.bootstrap(docs.filter(col("doc_id") < cut))
    assert(inv.fragmentCount === 1L)
    inv.append(docs.filter(col("doc_id") >= cut))
    assert(inv.fragmentCount === 2L)
    assert(inv.compactionDue(1) && !inv.compactionDue(2))
    inv.compact(buckets = 2)
    assert(inv.fragmentCount === 1L && !inv.compactionDue(1))
    val row = Fleet.report(spark, Seq(("inv", inv)), 0L, 1).collect().head
    assert(row.getAs[String]("kind") === "inverted")
    assert(!row.getAs[Boolean]("point_stale") &&
      !row.getAs[Boolean]("maintenance_due"))

    val lsh = new LshBandIndex(spark, TempDirs.create("fleet-spec-lsh"))
    lsh.bootstrap(docs.filter(col("doc_id") < cut))
    assert(lsh.fragmentCount === 1L)
    val lrow = Fleet.report(spark, Seq(("lsh", lsh)), 0L, 1).collect().head
    assert(lrow.getAs[String]("kind") === "lsh")
    assert(lrow.isNullAt(lrow.fieldIndex("nprobe")))
    assert(!lrow.getAs[Boolean]("maintenance_due"))
  }
}
