package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}

/** PERSISTED inverted text index — term postings with positions, the third
  * member of the persisted-index family ([[LshBandIndex]] bands,
  * [[IvfIndex]] cells). A 100 TB corpus is tokenized exactly once, ever:
  * each ingest tokenizes ONLY its delta and appends the delta's postings as
  * the next committed generation; queries read postings, never documents.
  *
  * Layout and commit discipline mirror [[LshBandIndex]]: posting rows live
  * in sequential generation directories `gen-0..gen-G` under one committed
  * watermark advanced by an atomic properties-file rename ([[BookmarkStore]],
  * the job-bookmark mechanism of SURVEY §2 S1 — cf.
  * `reference/glue_rds_to_redshift.py:27-34`'s bookmark contract). A crashed
  * append leaves an uncommitted `gen-(G+1)` readers never see. [[compact]]
  * folds all generations into ONE bucketed table CLUSTERED AND SORTED BY
  * `term`: sorted row groups give the parquet scan tight min/max `term`
  * statistics, so a k-term query's pushed `term IN (...)` predicate prunes
  * the scan to the row groups actually holding those terms — the
  * distributed analogue of an index seek. Query cost is therefore
  * posting-length-shaped (the documents containing the query terms), never
  * corpus-shaped.
  *
  * Postings carry in-document token positions (`positions`, 1-based), so
  * the index answers BOTH conjunctive (AND) queries and adjacency phrase
  * queries without touching document text. Position lists are per-(term,
  * doc) integer arrays — the classic posting-entry shape; at 100 TB they
  * dominate index size, so they are stored DELTA-ENCODED (gap lists, the
  * Lucene layout) and decoded only at the read boundary — see the codec
  * notes on `encodePositions`/`decodePositions`.
  */
final class InvertedIndex(spark: SparkSession, dir: String)
    extends MaintainedStore {

  // MaintainedStore — the O(1) ledger surface the fleet walk reads; the
  // text index has no probe operating point (query cost is posting-
  // length-shaped, not a recall knob), so it can never be point-stale
  def kind: String = "inverted"
  def pointSemantics: Boolean = false
  def pointGen: Option[Long] = None
  def pointProbe: Option[Int] = None

  private val store = new BookmarkStore(dir)
  private val ctx = "inverted_index"
  private def genDir(g: Long) = s"$dir/gen-$g"

  /** Highest committed generation; -1 = empty index. */
  def committedGen: Long = store.get("postings", ctx).getOrElse(-1L)

  /** Highest generation folded into the bucketed compaction; -1 = none. */
  def compactedThrough: Long = store.get("compacted", ctx).getOrElse(-1L)

  /** Directories a committed-view reader must list/scan right now — the
    * bucketed compaction (if one exists) plus the generations committed
    * after it ([[IvfIndex.fragmentCount]]'s signal for the text index).
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

  // bucket count keyed BY GENERATION (see LshBandIndex.compactedBuckets:
  // a crashed later compact() must not re-pair old files with a new count)
  private def compactedBuckets(g: Long): Int =
    store.get(s"compacted_buckets_$g", ctx).getOrElse(8L).toInt

  private[graft] def tableName: String =
    "graft_inv_idx_" + java.lang.Integer.toHexString(dir.hashCode)
  private def compactDir(g: Long) = s"$dir/compacted-$g"

  private val postingSchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("tf", IntegerType),
    StructField("positions", ArrayType(IntegerType, containsNull = false)),
    StructField("doc_len", IntegerType)))

  private def emptyPostings: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], postingSchema)

  // ---- position-list codec -------------------------------------------
  // Positions are stored DELTA-ENCODED (first value absolute, then gaps):
  // at 100 TB the position lists dominate index size, and gaps are small
  // near-constant ints that parquet's dictionary/bit-packed encodings
  // compress several-fold better than raw monotone offsets (the classic
  // posting-list layout — Lucene/ES store exactly this, minus the
  // varint byte-packing that parquet's own encodings already provide).
  // The codec is applied ONLY at the storage boundary: writes encode,
  // `postingsAsOf` decodes, and everything in between ([[compact]]'s
  // fold, generation unions) moves the raw encoded rows untouched. Both
  // directions are pure Catalyst array expressions — no UDF; a query
  // that never reads `positions` (conjunctive, BM25, stats) has the
  // decode projection PRUNED away entirely, so the codec costs nothing
  // off the phrase/NEAR path (plan-asserted in InvertedIndexSpec).

  private def encodePositions(rows: DataFrame): DataFrame =
    rows.withColumn("positions",
      when(col("positions").isNull || size(col("positions")) <= 1, col("positions"))
        .otherwise(concat(slice(col("positions"), 1, 1),
          zip_with(
            slice(col("positions"), lit(2), size(col("positions")) - 1),
            slice(col("positions"), lit(1), size(col("positions")) - 1),
            (a, b) => a - b))))

  private def decodePositions(rows: DataFrame): DataFrame =
    rows.withColumn("positions",
      when(col("positions").isNull || size(col("positions")) <= 1, col("positions"))
        .otherwise(expr(
          """aggregate(positions,
            |  struct(CAST(array() AS ARRAY<INT>) AS arr, 0 AS run),
            |  (acc, x) -> struct(concat(acc.arr, array(acc.run + x)), acc.run + x),
            |  acc -> acc.arr)""".stripMargin)))

  /** Tokenize `docs` (doc_id, text) into posting rows. One wide transform:
    * whitespace tokens (the [[graft.functions.GraftFunctions.tokens]]
    * contract the whole text family shares), positional explode, then a
    * single (term, doc_id) aggregation — the only shuffle, keyed on the
    * index's own storage key. Positions are 1-based token offsets.
    */
  def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.tokens(lower(col("text"))).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("doc_len"), posexplode(col("tk")))
      .groupBy(col("col").as("term"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("tf"),
        sort_array(collect_list((col("pos") + 1).cast("int"))).as("positions"),
        first(col("doc_len")).cast("int").as("doc_len"))

  private def compactedDf(g: Long): DataFrame = {
    if (!spark.catalog.tableExists(tableName)) {
      spark.sql(
        s"""CREATE TABLE $tableName
           |(term STRING, doc_id BIGINT, tf INT, positions ARRAY<INT>, doc_len INT)
           |USING parquet
           |CLUSTERED BY (term) SORTED BY (term) INTO ${compactedBuckets(g)} BUCKETS
           |LOCATION '${compactDir(g)}'""".stripMargin)
    }
    spark.table(tableName)
  }

  /** Every committed posting row: the bucketed compaction (if any) plus the
    * parquet tail generations appended since. Same no-spurious-union rule
    * as [[LshBandIndex.bandsDf]]: a union with an empty tail would erase
    * the compacted scan's bucket spec.
    */
  def postingsDf: DataFrame = postingsAsOf(committedGen)

  /** Snapshot read AS OF generation `g` — the index exactly as a reader
    * pinned at that watermark saw it (time travel, for free from the
    * generation layout: a snapshot is a PREFIX of the generation
    * sequence). Retention boundary: [[compact]] folds and DELETES the
    * generations it supersedes, so snapshots below `compactedThrough` no
    * longer exist — compaction is the explicit "vacuum" that trades
    * history for the exchange-free probe layout, and this method refuses
    * rather than silently serving the wrong snapshot.
    */
  def postingsAsOf(g: Long): DataFrame = decodePositions(rawAsOf(g))

  /** The stored (position-encoded) rows as of `g` — what [[compact]]
    * folds and the generation unions move; only [[postingsAsOf]] decodes.
    */
  private def rawAsOf(g: Long): DataFrame = {
    val committed = committedGen
    val c = compactedThrough
    require(g <= committed, s"as-of generation $g is ahead of the committed watermark $committed")
    require(g >= c || g < 0, s"generation $g was folded into the compaction " +
      s"(compactedThrough=$c) and its snapshot no longer exists")
    if (c < 0 && g < 0) emptyPostings
    else if (c < 0)
      spark.read.schema(postingSchema).parquet((0L to g).map(genDir): _*)
    else if (g <= c) compactedDf(c)
    else compactedDf(c).unionByName(
      spark.read.schema(postingSchema).parquet(((c + 1) to g).map(genDir): _*))
  }

  private def writeGen(g: Long, rows: DataFrame): Unit =
    encodePositions(
      rows.select(col("term").cast("string"), col("doc_id").cast("long"),
        col("tf").cast("int"), col("positions").cast("array<int>"),
        col("doc_len").cast("int")))
      .write.mode("overwrite").parquet(genDir(g))

  // BM25 needs two corpus-wide scalars (doc count, total token count);
  // reading them from postings would make every ranked query corpus-
  // shaped. They are instead maintained as O(1) driver-side metadata in
  // generation-keyed slots (like compacted_buckets_g): each ingest
  // commits the CUMULATIVE stats into its own generation's slot before
  // the watermark advances, so readers key by committedGen and a crashed
  // append's slot is invisible — same crash-consistency as the postings.
  private def statsOf(docs: DataFrame): (Long, Long) = {
    // coalesce guards: NULL-text docs count 0 tokens; an empty delta's
    // sum is 0, not a NULL the driver read would throw on
    val r = docs.select(count(lit(1)),
      coalesce(sum(coalesce(
        size(graft.functions.GraftFunctions.tokens(lower(col("text")))), lit(0))),
        lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Committed (n_docs, total token count) — O(1) metadata reads. */
  def corpusStats: (Long, Long) = {
    val g = committedGen
    (store.get(s"n_docs_$g", ctx).getOrElse(0L),
      store.get(s"total_len_$g", ctx).getOrElse(0L))
  }

  /** First ingest: index `docs` and commit generation 0. Idempotent. */
  def bootstrap(docs: DataFrame): Unit = if (committedGen < 0) {
    writeGen(0L, postingsOf(docs))
    val (n, len) = statsOf(docs)
    store.commit("n_docs_0", ctx, n)
    store.commit("total_len_0", ctx, len)
    store.commit("postings", ctx, 0L)
  }

  /** One incremental ingest: tokenize ONLY `delta` and append its postings
    * as the next committed generation (write first, watermark after — a
    * crash leaves an invisible orphan). Per-ingest cost is delta-shaped;
    * the committed corpus is never re-tokenized.
    */
  def append(delta: DataFrame): Unit = {
    val next = committedGen + 1
    writeGen(next, postingsOf(delta))
    val (n0, len0) = corpusStats
    val (dn, dlen) = statsOf(delta)
    store.commit(s"n_docs_$next", ctx, n0 + dn)
    store.commit(s"total_len_$next", ctx, len0 + dlen)
    store.commit("postings", ctx, next)
  }

  /** Fold every committed generation into ONE bucketed table sorted by
    * `term` (see class doc: sorted row-group stats make the query's term
    * filter a scan-pruning index seek; co-located buckets keep any
    * term-keyed maintenance join exchange-free). Commit-ordering and
    * superseded-storage cleanup mirror [[LshBandIndex.compact]].
    */
  def compact(buckets: Int = 8): Unit = {
    val g = committedGen
    require(g >= 0, "nothing to compact: the index is empty")
    if (compactedThrough == g) return
    // fold the RAW stored rows: the position codec is a storage-boundary
    // concern and compaction moves storage, so no decode/encode churn
    val all = rawAsOf(g)
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val target = new org.apache.hadoop.fs.Path(compactDir(g))
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, true)
    all.write.mode("overwrite").format("parquet")
      .option("path", compactDir(g))
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(tableName)
    val prevCompacted = compactedThrough
    store.commit(s"compacted_buckets_$g", ctx, buckets.toLong)
    store.commit("compacted", ctx, g)
    (math.max(prevCompacted + 1, 0L) to g).foreach { i =>
      val p = new org.apache.hadoop.fs.Path(genDir(i))
      try { if (fs.exists(p)) fs.delete(p, true) } catch { case _: Throwable => () }
    }
    if (prevCompacted >= 0) {
      val p = new org.apache.hadoop.fs.Path(compactDir(prevCompacted))
      try { if (fs.exists(p)) fs.delete(p, true) } catch { case _: Throwable => () }
    }
  }

  /** Conjunctive (AND) query: documents containing ALL of `terms`, with
    * the summed term frequency as the rank signal. One pruned posting
    * scan, one doc_id aggregation over posting-sized data — the corpus is
    * never read.
    */
  def conjunctive(terms: Seq[String], asOf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "conjunctive query needs at least one term")
    asOf.map(postingsAsOf).getOrElse(postingsDf)
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("_matched"),
        sum(col("tf")).cast("long").as("tf_sum"))
      .filter(col("_matched") === terms.distinct.size)
      .select(col("doc_id"), col("tf_sum"))
  }

  /** Disjunctive (OR) query: documents containing ANY of `terms`, with
    * the matched-term count and summed tf as rank signals. Same
    * pruned-scan + single-aggregation shape as [[conjunctive]] — the OR
    * is just the filter dropped.
    */
  def disjunctive(terms: Seq[String], asOf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "disjunctive query needs at least one term")
    asOf.map(postingsAsOf).getOrElse(postingsDf)
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).cast("int").as("n_matched"),
        sum(col("tf")).cast("long").as("tf_sum"))
  }

  /** Lucene-style minimum-should-match: documents containing at least
    * `minMatch` distinct terms of `terms` — the middle ground between
    * [[conjunctive]] (all) and [[disjunctive]] (any). One pruned posting
    * scan, one aggregation; the threshold is a post-aggregate filter on
    * the matched count, so the plan is identical to the OR query's.
    */
  def minShouldMatch(terms: Seq[String], minMatch: Int): DataFrame = {
    require(minMatch >= 1 && minMatch <= terms.distinct.size,
      s"minMatch $minMatch outside 1..${terms.distinct.size}")
    disjunctive(terms).filter(col("n_matched") >= minMatch)
  }

  /** Boolean AND NOT: [[conjunctive]] over `include` minus any document
    * containing an `exclude` term. The exclusion is a LEFT ANTI join
    * against the exclude terms' pruned postings — doc-set-sized, the
    * corpus is never read, and a hot exclude posting joins on the
    * already-aggregated include doc set (conjunctive-result-sized, the
    * smaller side by construction).
    */
  def conjunctiveNot(include: Seq[String], exclude: Seq[String]): DataFrame = {
    require(exclude.nonEmpty, "use conjunctive() when there is nothing to exclude")
    conjunctive(include).join(
      postingsDf.filter(col("term").isin(exclude: _*)).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** Exactly-once streaming ingest: apply one micro-batch as one committed
    * generation, idempotent under foreachBatch's at-least-once redelivery.
    * A replayed batch id (<= the committed marker) is a no-op; otherwise
    * the generation parquet is written first (an orphan until committed —
    * a crashed attempt is invisible and simply overwritten by the retry),
    * then the generation watermark, the cumulative stats, and the applied
    * batch id advance in ONE atomic properties-file rename
    * ([[BookmarkStore.commitAll]]) — there is no crash point where a
    * reader can see the batch half-applied or applied twice. This is the
    * [[graft.streaming.StreamSink]] run-ledger discipline turned inward:
    * the index's own watermark file IS the ledger.
    */
  def appendBatch(delta: DataFrame, batchId: Long): Unit = {
    if (store.get("last_batch", ctx).exists(_ >= batchId)) return
    val next = committedGen + 1
    writeGen(next, postingsOf(delta))
    val (n0, len0) = corpusStats
    val (dn, dlen) = statsOf(delta)
    store.commitAll(ctx, Map(
      s"n_docs_$next" -> (n0 + dn), s"total_len_$next" -> (len0 + dlen),
      "postings" -> next, "last_batch" -> batchId))
  }

  /** [[conjunctive]] with the classic lead-with-the-rarest-posting plan:
    * per-term df (a terms-sized aggregate of the pruned scan — O(terms)
    * driver metadata, same class as a bookmark read) orders the terms
    * rarest-first, the rarest term's doc set seeds the intersection, and
    * each further posting is applied as a LEFT SEMI join. Result-identical
    * to [[conjunctive]]; the plan differs where it matters at 100 TB: a
    * query pairing one rare term with a stopword-grade term never
    * aggregates the hot posting — the semi join streams it against the
    * (broadcastable) rare doc set, so the shuffled volume tracks the
    * RAREST posting, not the largest. The final tf_sum re-reads postings
    * only for the surviving docs.
    */
  def conjunctiveLeadRarest(terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "conjunctive query needs at least one term")
    val p = postingsDf.filter(col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
    val dfs = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a query term absent from the corpus (df 0) empties the AND
    if (dfs.length < terms.distinct.size) return p.select(col("doc_id"),
      col("tf").cast("long").as("tf_sum")).limit(0)
    val rarestFirst = dfs.sortBy { case (t, d) => (d, t) }.map(_._1)
    // The survivor set is bounded by the RAREST df (each semi join can
    // only shrink it), so while that bound fits an executor it is
    // BROADCAST and every hot posting streams map-side against it — the
    // stopword-grade posting is never shuffled or broadcast, which is the
    // entire point of leading with the rarest term (measured: the
    // inverted_lead_skew rehearsal family). A query whose rarest term is
    // itself huge (all-stopword AND) falls back to shuffled semi joins —
    // broadcasting an unbounded set is how executors OOM at 100 TB.
    val broadcastable = dfs.map(_._2).min <= 4L * 1024 * 1024
    def semi(left: DataFrame, right: DataFrame): DataFrame =
      left.join(if (broadcastable) broadcast(right) else right,
        Seq("doc_id"), "left_semi")
    var survivors = p.filter(col("term") === rarestFirst.head).select(col("doc_id"))
    rarestFirst.tail.foreach { t =>
      // intersection commutes: stream the bigger posting as the LEFT of
      // the semi join so the broadcast side stays rarest-bounded
      survivors = semi(p.filter(col("term") === t).select(col("doc_id")), survivors)
    }
    semi(p, survivors)
      .groupBy(col("doc_id")).agg(sum(col("tf")).cast("long").as("tf_sum"))
  }

  /** BM25 ranked retrieval (k1 = 1.2, b = 0.75): top-`k` documents for
    * `terms` by the classic Robertson/Sparck-Jones score. Reads ONLY the
    * query terms' postings (pruned scan) plus the O(1) committed corpus
    * stats; df per term comes from the pruned postings themselves (a
    * terms-sized broadcast join).
    *
    * Determinism at ANY term count (r8 verdict #5): the per-(term, doc)
    * partial score is a fixed double expression tree — bit-identical in
    * any IEEE-conforming engine that evaluates the same parenthesization,
    * which the DuckDB oracle replays verbatim — and is then snapped to
    * INTEGER micro-units (`floor(s * 1e6 + 0.5)`, exact in both engines)
    * BEFORE the per-doc sum. Long addition is associative and
    * commutative, so the aggregate is independent of partial-aggregation
    * order: with three or more query terms the old double sum's low bits
    * were run-dependent (merge order of partial aggregates), which is
    * exactly the class of nondeterminism a ranking that pages by score
    * cannot tolerate at 1000 executors. The 1e-6 quantization is two
    * orders below the 1e-4 presentation rounding.
    */
  def bm25(terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25 query needs at least one term")
    val (nDocs, totalLen) = corpusStats
    val avgdl = totalLen.toDouble / nDocs.toDouble
    val p = postingsDf.filter(col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf"), col("doc_len"))
    val dfreq = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("doc_len") / lit(avgdl)))
    p.join(broadcast(dfreq), Seq("term"))
      .select(col("doc_id"),
        floor(idf * ((col("tf") * lit(2.2)) / norm) * lit(1e6) + lit(0.5))
          .cast("long").as("s_u"))
      .groupBy(col("doc_id")).agg(sum(col("s_u")).as("su"))
      .orderBy(col("su").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("su") / lit(1e6), 4).as("score"))
  }

  /** BATCH BM25 (r15 verdict #7): one ranked top-`k` per query of a
    * (query_id, term) frame — the lexical arm of a batch-scale hybrid
    * retriever, where the single-query [[bm25]]'s driver-resident term
    * list and global ORDER BY/LIMIT stop working at 10⁴–10⁶ queries.
    *
    * Same scoring discipline as [[bm25]]: per-(term, doc) contributions
    * floored to integer micro-units BEFORE the per-(query, doc) sum, so
    * the long addition is order-independent and the score is bit-exact
    * at any term count; document frequency is the corpus-global df per
    * term (query-independent), and the per-query cut is by (raw su desc,
    * doc_id) — the batch twin of the single query's ORDER BY + LIMIT,
    * expressed as a query_id-partitioned window (never a global sort).
    *
    * Driver policy ([[IndexProbes]]' shape, term-flavored): the DISTINCT
    * TERM SET is vocabulary-bounded metadata — the cell-id analogue — so
    * it is collected for the posting scan's `IN` pushdown when at most
    * `termPushdownLimit` distinct terms appear (collected through a
    * LIMIT, so an unbounded vocabulary can never flood the driver;
    * above the limit the scan stays unpruned and the term join alone
    * restricts). Query ROWS are never collected: batches up to
    * `broadcastLimit` rows broadcast the (query_id, term) frame (the
    * posting side streams — zero shuffle before the aggregation);
    * larger batches take a SALTED shuffle-hash term join: term keys are
    * low-cardinality by construction (a batch's distinct terms number
    * in the hundreds while its query rows number 10⁴–10⁶), so an
    * unsalted term join concentrates the entire batch on |terms|
    * partitions — measured: a 42k-query two-term batch put ~168M scored
    * pairs through TWO tasks, 223 s and 1.9 GB page allocations. The
    * query side salts on hash(query_id) and the posting side replicates
    * each (term, doc) contribution across the `saltBuckets` via
    * explode — posting replication is corpus-term-sized (cheap), join
    * output is unchanged, and the work spreads across terms×buckets
    * partitions. After the join ONE exchange on query_id serves both
    * the per-(query, doc) sum (clustering on a prefix of the group key
    * is sufficient) and the per-query top-k window.
    */
  def bm25Batch(queryTerms: DataFrame, k: Int,
                broadcastLimit: Int = 4096,
                termPushdownLimit: Int = 1024,
                saltBuckets: Int = 32): DataFrame = {
    require(k >= 1 && saltBuckets >= 1)
    val (nDocs, totalLen) = corpusStats
    val avgdl = totalLen.toDouble / nDocs.toDouble
    // one evaluation, two consumers (the term IN-list and the join) —
    // pinned through Residue so the engine's end-of-query drain owns it
    val qt = graft.Residue.pin(
      queryTerms.select(col("query_id"), col("term")))
    val nQt = qt.count()
    val terms = qt.select(col("term")).distinct()
      .limit(termPushdownLimit + 1).collect().map(_.getString(0)).toSeq
    val p0 = postingsDf.select(col("term"), col("doc_id"), col("tf"),
      col("doc_len"))
    // At or under the limit, the driver-held IN list prunes the scan at
    // row-group granularity. ABOVE it the scan stays IN-free, but the
    // postings are still pruned EXECUTOR-SIDE with a left-semi join on
    // the batch's own distinct terms (r16 verdict #1: the old fallback
    // kept `p` the FULL postings frame, so `dfreq` below aggregated and
    // broadcast the whole vocabulary and the salted tier replicated the
    // UNPRUNED corpus ×saltBuckets before its join — corpus-sized shuffle
    // input on the one branch the declared queries never take). The
    // semi-join keeps every downstream frame query-term-sized at any
    // vocabulary, with zero driver-held term state.
    val p = if (terms.size <= termPushdownLimit)
      p0.filter(col("term").isin(terms: _*))
    else p0.join(qt.select(col("term")).distinct(), Seq("term"), "left_semi")
    val dfreq = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("doc_len") / lit(avgdl)))
    val contrib = p.join(broadcast(dfreq), Seq("term"))
      .select(col("term"), col("doc_id"),
        floor(idf * ((col("tf") * lit(2.2)) / norm) * lit(1e6) + lit(0.5))
          .cast("long").as("s_u"))
    val joined =
      if (nQt <= broadcastLimit) contrib.join(broadcast(qt), Seq("term"))
      else contrib
        .withColumn("salt",
          explode(sequence(lit(0), lit(saltBuckets - 1))))
        // pin the join's partition count (r17, measured): both pre-join
        // sides are SMALL (replicated contributions + the query frame),
        // so AQE's input-byte coalescing folds their exchanges to one or
        // two partitions — and the join OUTPUT, |batch|×posting-length
        // scored pairs, THE dominant frame of the whole query, is then
        // produced by that many tasks (the declared 10k-query batch ran
        // its ~41M-pair scoring on TWO tasks, ~5 s of a 16 s query on 32
        // cores). REPARTITION_BY_NUM is not coalescible and the build
        // side must co-partition, so the scoring fans out across the
        // session's parallelism; the count derives from the session,
        // never a constant tuned to one box.
        .repartition(spark.sparkContext.defaultParallelism,
          col("term"), col("salt"))
        .join(qt.withColumn("salt",
            pmod(hash(col("query_id")), lit(saltBuckets)))
          .hint("shuffle_hash"), Seq("term", "salt"))
        .drop("salt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("su").desc, col("doc_id"))
    joined
      // ONE exchange: query_id partitioning satisfies the (query_id,
      // doc_id) aggregation's clustering AND the window's
      .repartition(col("query_id"))
      .groupBy(col("query_id"), col("doc_id")).agg(sum(col("s_u")).as("su"))
      .withColumn("tr", row_number().over(w))
      .filter(col("tr") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("su") / lit(1e6), 4).as("score"))
  }

  /** Prefix (autocomplete / wildcard `pre*`) term browse: matching terms
    * with posting length and tf mass. The `StartsWith` predicate pushes
    * into the parquet scan, and because the compaction is SORTED BY term a
    * prefix is a CONTIGUOUS row-group range — the same index-seek pruning
    * as exact term lookups, for free.
    */
  def prefix(p: String): DataFrame =
    postingsDf.filter(col("term").startsWith(p))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("total_tf"))

  /** Index maintenance telemetry (the [[IvfIndex]] cell-balance analogue):
    * per-term posting length (df), total and max tf. Posting skew IS the
    * probe's tail latency — a stopword-grade term's posting is what
    * [[conjunctiveLeadRarest]] exists to avoid shuffling, and this report
    * is how an operator finds the terms worth a stop set. One aggregation
    * over (term, tf) — the positions column is pruned from the scan.
    */
  def termStats: DataFrame =
    postingsDf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("total_tf"),
        max(col("tf")).cast("int").as("max_tf"))

  /** Top TF-IDF terms for a DELTA of documents, scored against the
    * INDEX-RESIDENT corpus statistics — the per-ingest production shape
    * of [[graft.operators.TextAnalysis.tfIdfTopTerms]], which
    * re-aggregates the whole corpus and counts it per run. Here nDocs is
    * the O(1) committed corpus-stats slot (never a corpus count), df per
    * term comes from the postings of exactly the delta's terms (a
    * terms-sized broadcast join over the term-pruned posting scan — the
    * [[bm25]] discipline; positions are pruned out), and tf is one
    * map-only tokenize of the delta itself. Output is identical to the
    * batch operator over the indexed corpus restricted to the delta's
    * doc_ids, because the index's postings derive from the same token
    * kernel. Per-ingest cost: delta tokens + the delta terms' posting
    * lengths — never corpus-shaped.
    *
    * PRECONDITION (r12 advice): callers normally score a delta AFTER
    * appending it, so every delta term has a posting (its own occurrence
    * at minimum) and df >= 1 from the index. A term the index has never
    * seen does NOT silently vanish from the ranking: it scores with
    * df = 1 — "itself only", exactly the value its posting would carry
    * once ingested — so scoring before the append degrades gracefully to
    * self-counting df instead of quietly dropping the term.
    */
  def tfIdfTopTermsDelta(delta: DataFrame, k: Int,
                         text: org.apache.spark.sql.Column = col("text")): DataFrame = {
    val (nDocs, _) = corpusStats
    require(nDocs > 0, "the index is empty")
    val tf = graft.Residue.pin(delta
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.tokens(lower(text))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val terms = tf.select(col("term")).distinct()
    val dfreq = postingsDf.select(col("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // left join + df fallback 1: an un-ingested delta term self-counts
    // (see precondition scaladoc) instead of dropping out of the top-k
    val scored = tf.join(broadcast(dfreq), Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(1L)))
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "tfidf")
  }

  /** Adjacency phrase query `"a b"`: documents where some occurrence of
    * `a` is immediately followed by `b`, with the occurrence count. The
    * position lists make this a pure index operation: two pruned posting
    * scans joined on doc_id, adjacency = |shift(positions_a) ∩ positions_b|
    * — computed by the codegen'd two-pointer
    * [[graft.functions.AdjacencyCountExpr]] kernel (spec-pinned equal to
    * the composed transform+array_intersect formulation).
    */
  def phrase(a: String, b: String): DataFrame = near(a, b, maxGap = 1)

  /** Proximity (NEAR) query: documents where some occurrence of `a` is
    * followed by `b` within `maxGap` tokens, each `a` occurrence counted
    * once — the same pure-index two-pointer plan as [[phrase]] with the
    * gap widened.
    */
  def near(a: String, b: String, maxGap: Int): DataFrame = {
    val pa = postingsDf.filter(col("term") === a)
      .select(col("doc_id"), col("positions").as("pa"))
    val pb = postingsDf.filter(col("term") === b)
      .select(col("doc_id"), col("positions").as("pb"))
    pa.join(pb, Seq("doc_id"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.adjacencyCount(col("pa"), col("pb"), maxGap)
          .as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
  }
}
