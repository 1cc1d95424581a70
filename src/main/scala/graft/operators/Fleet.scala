package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.MaintainedStore

/** FLEET-LEVEL MAINTENANCE VIEW (r14 verdict next-round #5): every store
  * in the engine self-reports (lag, fragments, drift, capacity) and each
  * store's `maintain()` owns its own lifecycle — but a deployment runs
  * MANY persisted stores, and nothing walked them all and emitted one
  * schedulable report. This operator is that walk: one row per store in
  * a caller-supplied manifest, O(1) ledger metadata per row (properties-
  * file slot reads — zero Spark jobs, so a scheduler can run it every
  * tick over hundreds of stores).
  *
  * The decision rule per row, all replayable from the ledger:
  *   - `point_stale`   — the committed operating point was validated
  *     more than `maxLag` generations ago ([[graft.sources.IvfIndex.operatingPointLag]]'s
  *     signal; `topKFresh` refuses service on exactly this condition, so
  *     a stale row here means consumers are already being refused);
  *   - `compaction_due` — the committed view spans more than
  *     `maxFragments` fragment dirs (the read-amplification signal
  *     `compact()` resets);
  *   - `maintenance_due` — stale, OR fragmented, OR a point-serving
  *     store with NO committed point (never maintained: the no-knobs
  *     probe path refuses to serve it at all).
  *
  * What this deliberately does NOT do: run drift guards or recall sweeps
  * — those are data-sized and belong to each store's own `maintain()` at
  * era cadence. The fleet walk decides WHERE to spend that work.
  */
object Fleet {

  /** One report row per (name, store) manifest entry. */
  def report(spark: SparkSession, stores: Seq[(String, MaintainedStore)],
             maxLag: Long, maxFragments: Int): DataFrame = {
    require(maxLag >= 0 && maxFragments >= 1)
    import spark.implicits._
    stores.map { case (name, st) =>
      val g = st.committedGen
      val opGen = st.pointGen
      val lag = opGen.map(g - _)
      val frags = st.fragmentCount
      val stale = lag.exists(_ > maxLag)
      val neverMaintained = st.pointSemantics && opGen.isEmpty
      val compactionDue = frags > maxFragments
      (name, st.kind, g, st.compactedThrough, frags,
        opGen, lag, st.pointProbe,
        stale, compactionDue, stale || compactionDue || neverMaintained)
    }.toDF("store", "kind", "committed_gen", "compacted_through",
      "fragments", "op_gen", "lag", "nprobe",
      "point_stale", "compaction_due", "maintenance_due")
  }
}
