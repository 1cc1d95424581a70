package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PERSISTED product-quantization index — the train-once/encode-once/
  * probe-many production shape of [[graft.operators.Similarity.pqTopK]]
  * (which retrains codebooks and re-encodes the corpus inside every run
  * so the oracle can replay training). Train-once is the entire point of
  * PQ: a 100 TB corpus is Lloyd-clustered and encoded exactly once, ever;
  * each later ingest encodes ONLY its delta against the FROZEN codebooks
  * and appends a generation of (vec_id, codes) rows — m smallints per
  * vector, 32× narrower than the float embedding it stands in for.
  *
  * Frozen codebooks are the load-bearing production property (the
  * [[IvfIndex]] frozen-centroid discipline): a vector's codes are a pure
  * function of the vector, so stored codes stay valid forever and appends
  * are delta-sized. Retraining codebooks is a REBUILD — a new index root,
  * never an in-place mutation.
  *
  * Layout and commit discipline mirror [[IvfIndex]]: codebooks live at
  * `dir/books` (m × codes rows of Dim/m floats — driver metadata, the
  * seed-table pattern), code rows in sequential generation dirs
  * `gen-0..gen-G`, and the committed watermark advances via the bookmark
  * store's atomic properties-file rename only after the generation's
  * parquet is fully written. A crashed append leaves an uncommitted
  * generation readers never see.
  *
  * Query time is ADC ([[Similarity.pqAdcTopK]]): per query an m×codes
  * lookup table of subspace partial dots (codebook-sized work on the
  * broadcast query side), so the stored-code scan does m `element_at`
  * lookups per pair — the arithmetic matches the narrow representation.
  * No compaction operation exists, for the [[IvfIndex]] reason: the probe
  * consumes the stored codes via a broadcast join that never shuffles the
  * stored side, however many generations it spans.
  */
final class PqIndex(spark: SparkSession, dir: String,
                    m: Int = 8, codes: Int = 16) extends MaintainedStore {

  // MaintainedStore — the O(1) ledger surface the fleet walk reads; the
  // flat code store's only query knob (shortlist) is per-call, so no
  // committed operating point to go stale
  def kind: String = "pq"
  def pointSemantics: Boolean = false
  def pointGen: Option[Long] = None
  def pointProbe: Option[Int] = None

  private val store = new BookmarkStore(dir)
  private val ctx = "pq_index"
  private def genDir(g: Long) = s"$dir/gen-$g"
  private def baseDir(g: Long) = s"$dir/base-$g"
  private def booksDir = s"$dir/books"
  // m/codes shape the stored code rows and the ADC tables: reopening with
  // different values makes every lookup read codebook entries that were
  // never trained — fail at open, never mis-score (FAISS-header rule)
  StoreParams.validate(store, ctx, dir, Map("m" -> m, "codes" -> codes))

  /** Highest committed code generation; -1 = empty index. */
  def committedGen: Long = store.get("encode", ctx).getOrElse(-1L)

  /** The fit-time hyperparameters STAMPED at bootstrap — see
    * [[IvfPqIndex.fittedParams]]. Empty for pre-stamp artifacts.
    */
  def fittedParams: Map[String, Long] =
    Seq("m", "codes").flatMap(k => store.get(s"param.$k", ctx).map(k -> _)).toMap

  /** The frozen codebooks, collected as O(m·codes·Dim/m) driver
    * metadata — the seed-table read, never data-sized. MEMOIZED per
    * index handle (r17, the [[IvfPqIndex]] rule): codebooks are frozen
    * at bootstrap (retraining is a rebuild into a fresh dir), so one
    * driver read serves every later probe instead of two scheduler
    * round-trips per call; `lazy` keeps pre-bootstrap reads failing
    * un-cached.
    */
  private lazy val books: Map[(Int, Int), Seq[Float]] = spark.read.parquet(booksDir)
    .select(col("sub"), col("code"), col("w"))
    .collect().toSeq
    .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2))
    .toMap

  private def writeGen(g: Long, vectors: DataFrame,
                       bks: Map[(Int, Int), Seq[Float]]): Unit =
    Similarity.pqEncode(vectors, bks, m, codes)
      .select(col("vec_id").cast("long"), col("codes"))
      .write.mode("overwrite").parquet(genDir(g))

  /** First ingest: train codebooks on the bootstrap corpus (the
    * deterministic Lloyd discipline of [[Similarity.pqTrain]] — seeds =
    * first-`codes` slices in vec_id order, `iters` argmin rounds), freeze
    * them at `dir/books`, encode every bootstrap vector, commit
    * generation 0. Idempotent. `trainOn` optionally bounds the TRAINING
    * corpus (production trains codebooks on a sample — the BPE
    * bound-the-corpus rule); encoding always covers all of `corpus`.
    */
  def bootstrap(corpus: DataFrame, iters: Int = 2,
                trainOn: Option[DataFrame] = None): Unit =
    if (committedGen < 0) {
      val trained = Similarity.pqTrain(trainOn.getOrElse(corpus), m, codes, iters)
      import spark.implicits._
      trained.toSeq.map { case ((s, c), w) => (s, c, w) }
        .toDF("sub", "code", "w")
        .coalesce(1).write.mode("overwrite").parquet(booksDir)
      writeGen(0L, corpus, trained)
      store.commitAll(ctx,
        Map("encode" -> 0L) ++ StoreParams.stamp(Map("m" -> m, "codes" -> codes)))
    }

  /** One incremental ingest: encode ONLY `delta` against the frozen
    * codebooks and append it as the next committed generation. Cost is
    * delta × (m·codes) sub-dot argmins — nothing touches the stored
    * corpus.
    */
  def append(delta: DataFrame): Unit = {
    val g = committedGen
    require(g >= 0, "append before bootstrap: the index has no codebooks")
    writeGen(g + 1, delta, books)
    store.commit("encode", ctx, g + 1)
  }

  /** Exactly-once streaming ingest — [[IvfIndex.appendBatch]]'s
    * discipline for the code store: one micro-batch = one committed
    * generation, idempotent under foreachBatch redelivery.
    */
  def appendBatch(delta: DataFrame, batchId: Long): Unit = {
    if (store.get("last_batch", ctx).exists(_ >= batchId)) return
    val g = committedGen
    require(g >= 0, "append before bootstrap: the index has no codebooks")
    writeGen(g + 1, delta, books)
    store.commitAll(ctx, Map("encode" -> (g + 1), "last_batch" -> batchId))
  }

  /** Generation the last [[compact]] folded through; -1 = never
    * compacted.
    */
  def compactedThrough: Long = store.get("base", ctx).getOrElse(-1L)

  /** Directories a committed-view reader must list/scan right now
    * ([[IvfIndex.fragmentCount]]) — O(1) metadata arithmetic.
    */
  def fragmentCount: Long = {
    // base read BEFORE the watermark (the [[codesDf]] rule): a concurrent
    // compact between the two slot reads must degrade to a stale-but-safe
    // base, never a refused base-ahead-of-watermark crash
    val base = compactedThrough
    val g = committedGen
    if (g < 0) 0L else Generations.dirs(base, g, genDir, baseDir).size.toLong
  }

  /** The compaction policy predicate ([[IvfIndex.compactionDue]]). */
  def compactionDue(maxFragments: Int): Boolean =
    maxFragments >= 1 && fragmentCount > maxFragments

  /** Every committed code row (vec_id, codes): the compacted base (if
    * one exists) plus the generations committed after it.
    */
  def codesDf: DataFrame = {
    // base read BEFORE the watermark ([[IvfPqIndex.rowsDf]]'s rule): a
    // compact committing between the two slot reads could otherwise hand
    // Generations a base ahead of the captured g (which it refuses)
    val base = compactedThrough
    val g = committedGen
    require(g >= 0, "the index is empty")
    Generations.readAsOf(spark, base, g, genDir, baseDir)
  }

  /** COMPACTION — [[IvfPqIndex.compact]]'s discipline for the flat code
    * store. The ADC scan reads every code row by design (no coarse
    * structure to prune on), so the win here is listing cost O(1) in
    * ingest history and full row groups instead of per-micro-batch
    * fragments; rows are clustered by vec_id for the shortlist re-rank
    * join. Same crash-safety (base written before the slot renames in),
    * watermark-capture (the fold scans exactly the captured watermark's
    * dirs, never the live view), single-writer discipline, and opt-in
    * listing-based retirement.
    */
  def compact(retireSuperseded: Boolean = false): Unit = {
    // base read BEFORE the watermark — the uniform reader rule
    // ([[fragmentCount]]/[[codesDf]]): base-first can only yield a
    // stale-but-safe base, never one ahead of the captured watermark
    val prev = compactedThrough
    val g = committedGen
    require(g >= 0, "compact before bootstrap: the index has no rows")
    if (g == prev) {
      // honor a requested retirement sweep even when the fold is a no-op
      // (a prior no-retire compact's superseded dirs would leak forever)
      if (retireSuperseded) Generations.retireThrough(spark, dir, g)
      return
    }
    Generations.readAsOf(spark, prev, g, genDir, baseDir)
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").parquet(baseDir(g))
    store.commit("base", ctx, g)
    if (retireSuperseded) Generations.retireThrough(spark, dir, g)
  }

  /** ADC top-k against the stored codes: identical output to
    * [[Similarity.pqTopK]] with the same training corpus — minus the
    * training and corpus-wide encode, which this index exists to never
    * recompute. `corpus` supplies true embeddings for the exact re-rank
    * of shortlisted candidates only.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           shortlist: Int): DataFrame =
    Similarity.pqAdcTopK(codesDf, corpus, queries, books, m, codes, k, shortlist)
}
