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
  * Scale shape: the probe join shuffles on (band, band_key); generation
  * dirs are plain parquet, so with the store bucketed on that key only the
  * delta-sized side moves. The per-ingest cost is band(delta) + probe +
  * verify(matched docs) — nothing is proportional to the corpus, and the
  * r7 rehearsal row (`incr_lsh_indexed`) measures exactly that claim.
  */
final class LshBandIndex(spark: SparkSession, dir: String,
                         n: Int = 3, k: Int = 16, bands: Int = 4) {

  private val store = new BookmarkStore(dir)
  private val ctx = "lsh_band_index"
  private def genDir(g: Long) = s"$dir/gen-$g"

  /** Highest committed generation; -1 = empty index. */
  def committedGen: Long = store.get("bands", ctx).getOrElse(-1L)

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("band_key", LongType)))

  /** Every committed band row (doc_id, band, band_key). */
  def bandsDf: DataFrame = {
    val g = committedGen
    if (g < 0) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema)
    else spark.read.schema(bandSchema)
      .parquet((0L to g).map(genDir): _*)
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
    store.commit("bands", ctx, 0L)
  }

  /** One incremental ingest: sweep `delta` against the committed index
    * (plus the delta's own bands, so delta-delta near-dups are found),
    * verify candidates by exact Jaccard >= `threshold` over `corpusText`
    * (doc_id, text — read only for docs appearing in some candidate), feed
    * the verified pairs to `sink`, THEN append the delta's bands as the
    * next committed generation. Output contract is
    * [[graft.operators.Dedup.minhashLshPairsIncremental]]'s: exactly the
    * full sweep's pairs involving a delta doc.
    */
  def sweepAndAppend(corpusText: DataFrame, delta: DataFrame,
                     threshold: Double)(sink: DataFrame => Unit): Unit = {
    // the delta's bands feed the probe AND the post-sink append — pin so
    // the delta is shingled once; freed by the caller's end-of-query drain
    val dBands = Residue.pin(Dedup.minhashBands(delta, n, k, bands))
    val cand = dBands.as("x")
      .join(bandsDf.unionByName(dBands).as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("id_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("id_b"))
      .distinct()
    val involved = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    val grams = corpusText
      .join(involved, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(col("text"), n).as("gs"))
    val pairs = cand
      .join(grams.as("ga"), col("id_a") === col("ga.doc_id"))
      .join(grams.as("gb"), col("id_b") === col("gb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ga.gs"), col("gb.gs"))).cast("double") /
          size(array_union(col("ga.gs"), col("gb.gs"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    sink(pairs)
    // sink succeeded -> append the delta's bands and advance the watermark
    val next = committedGen + 1
    writeGen(next, dBands)
    store.commit("bands", ctx, next)
  }
}
