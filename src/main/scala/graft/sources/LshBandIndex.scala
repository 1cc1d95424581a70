package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StructField, StructType}

import graft.Residue
import graft.operators.Dedup

/** PERSISTED MinHash-LSH band index — the production shape of
  * [[graft.operators.Dedup.minhashLshPairsIncremental]], which documents
  * the contract ("the band table is an append-only index") but re-bands
  * the old corpus on every run so the oracle can replay it. Here the index
  * is a real stored table: a 100 TB corpus is shingled exactly once, ever;
  * each ingest bands ONLY its delta, probes the stored index, and appends
  * its own bands for the next run.
  *
  * Layout and commit discipline mirror the job bookmark (SURVEY §2 S1,
  * [[BookmarkStore]]): band rows live in sequential generation directories
  * `gen-0..gen-G`, and the single committed watermark G advances — via the
  * same atomic properties-file rename — ONLY after the caller's sink has
  * consumed the sweep result (commit-after-sink, the reference's D4/D6
  * defect fixed). A crashed run leaves an uncommitted `gen-(G+1)` that
  * readers never see and the next run overwrites; a failed sink appends
  * nothing, so the next run re-sweeps the same delta. The index is thus
  * append-only and exactly-once; the sink keeps the same at-least-once
  * window as [[graft.operators.IncrementalStarJob]], closed by idempotent
  * sinks.
  *
  * Scale shape: the probe join keys on (band, band_key); the per-ingest
  * cost is band(delta) + probe + verify(matched docs) — nothing is
  * proportional to the corpus, and the r7 rehearsal row
  * (`incr_lsh_indexed`) measures exactly that claim. [[compact]] folds the
  * generations into ONE bucketed+sorted table on the probe key, after
  * which the stored side joins with NO exchange at all (spec-asserted) —
  * only delta-sized data ever crosses the network, the co-located-join
  * discipline of [[Bucketing]] applied to index maintenance.
  */
final class LshBandIndex(spark: SparkSession, dir: String,
                         n: Int = 3, k: Int = 16, bands: Int = 4)
    extends MaintainedStore {

  // MaintainedStore — the O(1) ledger surface the fleet walk reads; the
  // band index has no probe operating point (its recall is the fixed
  // (n, k, bands) banding family stamped at open), so never point-stale
  def kind: String = "lsh"
  def pointSemantics: Boolean = false
  def pointGen: Option[Long] = None
  def pointProbe: Option[Int] = None

  private val store = new BookmarkStore(dir)
  private val ctx = "lsh_band_index"
  private def genDir(g: Long) = s"$dir/gen-$g"
  // stored band keys are a pure function of (n, k, bands): probing with
  // drifted values finds no (or wrong) collisions — fail at open
  // (FAISS-header rule)
  StoreParams.validate(store, ctx, dir,
    Map("n" -> n, "k" -> k, "bands" -> bands))

  /** Highest committed generation; -1 = empty index. */
  def committedGen: Long = store.get("bands", ctx).getOrElse(-1L)

  /** Highest generation folded into the bucketed compaction; -1 = none. */
  def compactedThrough: Long = store.get("compacted", ctx).getOrElse(-1L)

  /** Directories a committed-view reader must list/scan right now — the
    * bucketed compaction (if one exists) plus the generations committed
    * after it ([[IvfIndex.fragmentCount]]'s signal for the band index).
    * O(1) metadata arithmetic; base slot read BEFORE the watermark, the
    * uniform reader rule.
    */
  def fragmentCount: Long = {
    val base = compactedThrough
    val g = committedGen
    if (g < 0) 0L else if (base < 0) g + 1 else (g - base) + 1
  }

  /** The compaction policy predicate ([[IvfIndex.compactionDue]]). */
  def compactionDue(maxFragments: Int): Boolean =
    maxFragments >= 1 && fragmentCount > maxFragments

  // bucket count is keyed BY GENERATION: a crashed later compact() must
  // not leave a bucket count that pairs with an older compaction's files —
  // re-registering old files under a new bucket count would silently
  // mis-bucket the join (each watermark reads only its own slot)
  private def compactedBuckets(g: Long): Int =
    store.get(s"compacted_buckets_$g", ctx).getOrElse(8L).toInt

  // catalog identity for the compacted bucketed table — deterministic from
  // the index location so a fresh session re-finds it
  private[graft] def tableName: String =
    "graft_lsh_idx_" + java.lang.Integer.toHexString(dir.hashCode)
  private def compactDir(g: Long) = s"$dir/compacted-$g"

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("band_key", LongType)))

  private def emptyBands: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema)

  /** The compacted bucketed table as a catalog-backed frame, re-registering
    * the external table if this session's catalog has not seen it (the
    * bucket spec lives in the table metadata — a plain parquet read of the
    * same files would lose the co-location and re-shuffle the stored side).
    */
  private def compactedDf(g: Long): DataFrame = {
    if (!spark.catalog.tableExists(tableName)) {
      spark.sql(
        s"""CREATE TABLE $tableName (doc_id BIGINT, band INT, band_key BIGINT)
           |USING parquet
           |CLUSTERED BY (band, band_key) SORTED BY (band, band_key)
           |INTO ${compactedBuckets(g)} BUCKETS
           |LOCATION '${compactDir(g)}'""".stripMargin)
    }
    spark.table(tableName)
  }

  /** Every committed band row (doc_id, band, band_key): the bucketed
    * compaction (if any) plus the parquet tail generations appended since.
    */
  def bandsDf: DataFrame = {
    val g = committedGen
    val c = compactedThrough
    if (c < 0 && g < 0) emptyBands
    else if (c < 0)
      spark.read.schema(bandSchema).parquet((0L to g).map(genDir): _*)
    // no union when there is no tail: even a union with an EMPTY frame
    // erases the scan's bucket spec and reintroduces the stored-side
    // exchange the compaction exists to remove (spec-pinned)
    else if (g <= c) compactedDf(c)
    else compactedDf(c).unionByName(
      spark.read.schema(bandSchema).parquet(((c + 1) to g).map(genDir): _*))
  }

  /** Index-maintenance telemetry (the [[InvertedIndex.termStats]] /
    * [[IvfIndex.balanceReport]] analogue for LSH bands): per band, the
    * bucket count, total rows, largest bucket, and the exact candidate
    * PAIR bound sum n·(n−1)/2 over its buckets — which IS the probe
    * join's worst-case output for that band. A template-heavy corpus
    * concentrates band keys; this report is where an operator sees the
    * blow-up coming (and retunes k/bands or adds a stop-band list)
    * BEFORE an ingest sweep goes quadratic. One aggregation over the
    * stored band rows, grouped on the index's own storage key — on the
    * compacted table the first aggregation is exchange-free.
    */
  def bandStats: DataFrame =
    bandsDf.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n")).cast("long").as("n_rows"),
        max(col("n")).cast("long").as("max_bucket"),
        sum(expr("n * (n - 1) DIV 2")).cast("long").as("candidate_pairs"))

  /** The stop-band list at occupancy cap `cap`: every (band, band_key)
    * bucket holding more than `cap` docs — the buckets [[bandStats]]'
    * `candidate_pairs` column shows going quadratic. Template-heavy
    * corpora (boilerplate headers, licence blocks, scraped nav chrome)
    * concentrate one band key across millions of documents; enumerating
    * that bucket's pairs is O(n²) and the verify join downstream pays it.
    * Excluding a delta's band rows at stopped keys (see
    * [[sweepAndAppend]]'s `stopBands`) bounds every bucket's probe
    * output at cap·|delta-rows-in-bucket| — the LSH analogue of the
    * inverted index's lead-rarest stopword defense and the classic
    * stop-band list of production near-dup systems. Recall tradeoff is
    * the banding bound: a pair is lost only if stopped buckets were its
    * ONLY agreeing bands.
    *
    * Computed over the COMPACTED table only — the stop list is
    * compaction-cadence metadata (refreshed when [[compact]] folds the
    * tail), so it is deterministic under ingest replay: tail generations
    * appended between compactions never shift it mid-stream. On a
    * never-compacted index it falls back to all committed bands. Output
    * is O(#mega-buckets) — broadcast-sized by construction.
    */
  def stopBands(cap: Int): DataFrame = {
    val src = if (compactedThrough >= 0) compactedDf(compactedThrough)
              else bandsDf
    src.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n")).filter(col("n") > cap)
      .select(col("band"), col("band_key"))
  }

  /** Fold every committed generation into ONE bucketed+sorted table on
    * (band, band_key) — the probe join's key — so the stored side of every
    * subsequent sweep reads co-located buckets and shuffles NOTHING; only
    * the delta moves (the [[Bucketing]] discipline applied to the index).
    * At 100 TB this is the maintenance operation that keeps per-ingest
    * probe cost delta-shaped forever: run it when the parquet tail has
    * grown past a few generations. Commit-ordering mirrors the appends —
    * table written first, watermark advanced after, so a crash mid-compact
    * leaves an invisible orphan and readers keep the generation view; the
    * superseded generation dirs are removed only after the commit.
    */
  def compact(buckets: Int = 8): Unit = {
    val g = committedGen
    require(g >= 0, "nothing to compact: the index is empty")
    if (compactedThrough == g) return // already fully compacted — no-op
    val all = bandsDf
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val target = new org.apache.hadoop.fs.Path(compactDir(g))
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, true)
    all.write.mode("overwrite").format("parquet")
      .option("path", compactDir(g))
      .bucketBy(buckets, "band", "band_key").sortBy("band", "band_key")
      .saveAsTable(tableName)
    val prevCompacted = compactedThrough
    store.commit(s"compacted_buckets_$g", ctx, buckets.toLong)
    store.commit("compacted", ctx, g)
    // best-effort cleanup of superseded storage (never read again)
    (math.max(prevCompacted + 1, 0L) to g).foreach { i =>
      val p = new org.apache.hadoop.fs.Path(genDir(i))
      try { if (fs.exists(p)) fs.delete(p, true) } catch { case _: Throwable => () }
    }
    if (prevCompacted >= 0) {
      val p = new org.apache.hadoop.fs.Path(compactDir(prevCompacted))
      try { if (fs.exists(p)) fs.delete(p, true) } catch { case _: Throwable => () }
    }
  }

  private def writeGen(g: Long, rows: DataFrame): Unit =
    rows.select(col("doc_id").cast("long"), col("band").cast("int"),
      col("band_key").cast("long"))
      .write.mode("overwrite").parquet(genDir(g))

  /** First ingest: band `docs` and commit generation 0. Idempotent — a
    * bootstrap over an already-bootstrapped index is a no-op.
    */
  def bootstrap(docs: DataFrame): Unit = if (committedGen < 0) {
    writeGen(0L, Dedup.minhashBands(docs, n, k, bands))
    store.commitAll(ctx, Map("bands" -> 0L) ++
      StoreParams.stamp(Map("n" -> n, "k" -> k, "bands" -> bands)))
  }

  /** One incremental ingest: sweep `delta` against the committed index
    * (plus the delta's own bands, so delta-delta near-dups are found),
    * verify candidates by exact Jaccard >= `threshold` over `corpusText`
    * (doc_id, text — read only for docs appearing in some candidate), feed
    * the verified pairs to `sink`, THEN append the delta's bands as the
    * next committed generation. Output contract is
    * [[graft.operators.Dedup.minhashLshPairsIncremental]]'s: exactly the
    * full sweep's pairs involving a delta doc.
    *
    * `runKey` (optional) makes the APPEND idempotent under whole-ingest
    * replay: a nonempty key is committed atomically with the band
    * watermark, and a later call carrying an already-committed key still
    * sweeps and sinks (at-least-once sink, closed by idempotent sinks —
    * same window as the star job) but skips re-appending the delta's
    * bands. Without it, a replayed ingest — a bench warm run re-executing
    * the same declared query against an [[graft.IndexCache]]-cached index
    * — would grow the index by one duplicate generation per run. The
    * sweep RESULT is replay-invariant either way: a delta doc's own
    * committed bands are excluded by the `doc_id` inequality, and
    * delta-vs-delta pairs are already produced by the delta-side probe,
    * so the distinct'd pair set is identical before and after the append.
    *
    * `stopBands` (optional, see [[stopBands]]) excludes the listed
    * (band, band_key) buckets from candidate generation: the DELTA side
    * of both probes is anti-joined against the broadcast list, which
    * suffices — a stored (or delta) row at a stopped key can only match
    * a delta row at the same key, and the delta side has none left. The
    * APPEND is never filtered: the index stores every band row, so the
    * stop list stays a query-time policy that a later retune can relax
    * without re-shingling history.
    */
  def sweepAndAppend(corpusText: DataFrame, delta: DataFrame,
                     threshold: Double, runKey: String = "",
                     stopBands: Option[DataFrame] = None)
                    (sink: DataFrame => Unit): Unit = {
    // the delta's bands feed the probe AND the post-sink append — pin so
    // the delta is shingled once; freed by the caller's end-of-query drain
    val dBandsAll = Residue.pin(Dedup.minhashBands(delta, n, k, bands))
    val dBands = stopBands.fold(dBandsAll)(sb =>
      dBandsAll.join(broadcast(sb.select(col("band"), col("band_key"))),
        Seq("band", "band_key"), "left_anti"))
    // two separate probes (index, delta-delta) rather than one probe of
    // their union: unioning onto the stored side would erase its bucket
    // spec, and with a compacted index the whole point is that the stored
    // side joins WITHOUT an exchange — join distributes over union, so the
    // result set is identical and the distinct merges both directions
    def probe(y: DataFrame): DataFrame = dBands.as("x")
      .join(y.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("id_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("id_b"))
    // the candidate set feeds the verify plan FOUR times (both sides of
    // the id union, then through both gram-join arms) and the gram table
    // twice — unpinned, Catalyst re-derives the whole probe (index scan +
    // delta banding) per reference: measured 3.4-6.4 s vs 2.3 s per sweep
    // at sf0.1. Both pins are candidate-volume-sized (pair ids; involved
    // docs' shingles), the operator's own output scale — freed by the
    // caller's end-of-query drain
    val cand = Residue.pin(
      probe(bandsDf).unionByName(probe(dBands)).distinct())
    val involved = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    val grams = Residue.pin(corpusText
      .join(involved, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(col("text"), n).as("gs")))
    val pairs = cand
      .join(grams.as("ga"), col("id_a") === col("ga.doc_id"))
      .join(grams.as("gb"), col("id_b") === col("gb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ga.gs"), col("gb.gs"))).cast("double") /
          size(array_union(col("ga.gs"), col("gb.gs"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    sink(pairs)
    // sink succeeded -> append the delta's bands and advance the watermark
    // (skipped when this ingest's runKey is already committed: the append
    // already happened and re-appending would duplicate the generation)
    val runSlot = if (runKey.isEmpty) "" else
      "run_" + java.lang.Integer.toHexString(runKey.hashCode)
    val replayed = runKey.nonEmpty && store.get(runSlot, ctx).isDefined
    if (!replayed) {
      val next = committedGen + 1
      writeGen(next, dBandsAll)
      if (runKey.isEmpty) store.commit("bands", ctx, next)
      else store.commitAll(ctx, Map("bands" -> next, runSlot -> 1L))
    }
  }
}
