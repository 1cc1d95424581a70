package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.LshBandIndex

/** The persisted band index must be indistinguishable from the
  * replay-from-scratch incremental sweep (same pairs), while never
  * re-shingling the old corpus and never exposing an uncommitted append.
  */
class LshBandIndexSpec extends SparkSuite {

  private def universe = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
  private def oldDocs = universe.filter(col("doc_id") % 50 =!= 0)
  private def delta = universe.filter(col("doc_id") % 50 === 0)

  private def sweepVia(idx: LshBandIndex): Seq[(Long, Long, Double)] = {
    var out: Seq[(Long, Long, Double)] = Nil
    idx.sweepAndAppend(universe, delta, threshold = 0.6) { pairs =>
      out = pairs.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    }
    out
  }

  test("indexed sweep equals the replay-from-scratch incremental sweep") {
    val idx = new LshBandIndex(spark, TempDirs.create("lsh-idx-spec"))
    idx.bootstrap(oldDocs)
    assert(idx.committedGen === 0L)
    val expected = Dedup.minhashLshPairsIncremental(oldDocs, delta,
        n = 3, k = 16, bands = 4, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(expected.nonEmpty)
    assert(sweepVia(idx) === expected)
    // sink succeeded -> the delta's bands were appended and committed
    assert(idx.committedGen === 1L)
    assert(idx.bandsDf.count() ===
      Dedup.minhashBands(universe, 3, 16, 4).count())
  }

  test("commit-after-sink: a failed sink appends nothing; the retry sweeps the same delta") {
    val idx = new LshBandIndex(spark, TempDirs.create("lsh-idx-spec2"))
    idx.bootstrap(oldDocs)
    intercept[RuntimeException] {
      idx.sweepAndAppend(universe, delta, 0.6) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(idx.committedGen === 0L) // no half-ingested index
    val retry = sweepVia(idx) // same delta, now with a working sink
    assert(retry.nonEmpty)
    assert(idx.committedGen === 1L)
  }

  test("an uncommitted generation directory is invisible to readers") {
    val dir = TempDirs.create("lsh-idx-spec3")
    val idx = new LshBandIndex(spark, dir)
    idx.bootstrap(oldDocs)
    val committedRows = idx.bandsDf.count()
    // simulate a crash mid-append: gen-1 parquet exists, watermark doesn't
    Dedup.minhashBands(delta, 3, 16, 4)
      .write.mode("overwrite").parquet(s"$dir/gen-1")
    assert(idx.committedGen === 0L)
    assert(idx.bandsDf.count() === committedRows)
    // the next ingest overwrites the orphan and commits atomically
    assert(sweepVia(idx).nonEmpty)
    assert(idx.committedGen === 1L)
  }

  test("bootstrap is idempotent") {
    val idx = new LshBandIndex(spark, TempDirs.create("lsh-idx-spec4"))
    idx.bootstrap(oldDocs)
    val rows = idx.bandsDf.count()
    idx.bootstrap(universe) // second bootstrap must be a no-op
    assert(idx.committedGen === 0L)
    assert(idx.bandsDf.count() === rows)
  }
}
