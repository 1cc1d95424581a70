package graft

/** End-to-end equality of the two incremental corpus-cleaning
  * compositions (r7 verdict #4): the declared `corpus_clean_incr`
  * (history re-signed each run — the oracle-replayable shape) and
  * `corpus_clean_incr_indexed` (the production shape: near-dup stage
  * probes a persisted, compacted [[graft.sources.LshBandIndex]] via
  * sweepAndAppend, commit-after-sink) must be row-for-row identical.
  *
  * Runs at sf0.1 deliberately: it is the only fixture scale where the
  * history era is NON-empty (cutoff = max sampled id − 499 keeps 450
  * history docs / 50 delta docs), so the stored-index probe path — the
  * part that differs between the two compositions — actually carries the
  * comparison. At sf0.001/sf0.01 the 500-doc corpus makes the history
  * empty and both queries degenerate to the same delta-only sweep.
  */
class CorpusCleanIncrSpec extends SparkSuite {

  test("persisted-index composition is indistinguishable from the re-signing one (non-empty history)") {
    val dir = "/root/testdata/sf0.1"
    val plain = SparkEntry.queries("corpus_clean_incr")(spark, dir)
    val indexed = SparkEntry.queries("corpus_clean_incr_indexed")(spark, dir)
    val a = plain.collect().toSeq
    Residue.drain(spark) // the queries pin; free between the two runs
    val b = indexed.collect().toSeq
    assert(a.nonEmpty, "empty report — the fixture lost its delta era")
    assert(a == b, s"compositions diverged:\n plain=$a\n indexed=$b")
  }
}
