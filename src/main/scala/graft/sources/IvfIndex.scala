package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PERSISTED IVF index — the production shape of
  * [[graft.operators.Similarity.ivfTopK]], which documents the cell
  * assignment ("every corpus vector goes to its argmax-cosine cell in ONE
  * map-only pass") but recomputes it per query so the oracle can replay
  * it. Here the assignment is a real stored table: a 100 TB corpus is
  * scored against the centroids exactly once, ever; each ingest assigns
  * ONLY its delta against the FROZEN centroids and appends a generation.
  *
  * Frozen centroids are the load-bearing production property: seeds are
  * derived from the bootstrap corpus and never move afterward, so an
  * appended vector's cell is a pure function of the vector — existing
  * assignments stay valid forever and appends are delta-sized. (Retraining
  * centroids is a REBUILD — a new index directory — never an in-place
  * mutation, exactly like a new bookmark lineage.)
  *
  * Layout and commit discipline mirror [[LshBandIndex]] / the job bookmark
  * (SURVEY §2 S1): assignment rows live in sequential generation dirs
  * `gen-0..gen-G` under a spark-visible root, and the committed watermark
  * advances via the atomic properties-file rename only after the
  * generation's parquet is fully written. A crashed append leaves an
  * uncommitted `gen-(G+1)` that readers never see and the next append
  * overwrites.
  *
  * No compaction operation exists here ON PURPOSE, where [[LshBandIndex]]
  * needed one: the ANN probe side (queries × nprobe cells) is tiny and
  * broadcast, so the stored assignments are consumed by a
  * BroadcastHashJoin that never shuffles the stored side no matter how
  * many generations it spans — there is no exchange for a bucketed layout
  * to remove. The band index's probe, by contrast, equi-joins two
  * data-sized sides on (band, band_key), which is why it buckets.
  */
final class IvfIndex(spark: SparkSession, dir: String,
                     nlist: Int = 16) {

  private val store = new BookmarkStore(dir)
  private val ctx = "ivf_index"
  private def genDir(g: Long) = s"$dir/gen-$g"
  private def seedsDir = s"$dir/seeds"

  /** Highest committed assignment generation; -1 = empty index. */
  def committedGen: Long = store.get("assign", ctx).getOrElse(-1L)

  /** The frozen centroids, collected as O(nlist) driver metadata — the
    * same role as a bookmark read: never data-sized.
    */
  private def seeds: Seq[(Long, Seq[Float])] = spark.read.parquet(seedsDir)
    .select(col("cell_id"), col("embedding"))
    .collect().toSeq
    .map(r => (r.getLong(0), r.getSeq[Float](1)))
    .sortBy(_._1)

  /** Per-row scored cells against the frozen seeds: lexicographic
    * max/sort = best cosine, ties to the lowest cell id — identical
    * arithmetic to [[Similarity.ivfTopK]] so the oracle replay carries
    * over unchanged.
    */
  private def scored(ss: Seq[(Long, Seq[Float])])(emb: org.apache.spark.sql.Column) =
    ss.map { case (cid, v) =>
      struct(graft.functions.GraftFunctions.cosineSimilarity(emb, typedlit(v)).as("cs"),
        lit(-cid).as("nc"), lit(cid).as("cell"))
    }

  private def assign(vectors: DataFrame, ss: Seq[(Long, Seq[Float])]): DataFrame =
    vectors.select(col("vec_id"),
      greatest(scored(ss)(col("embedding")): _*).getField("cell").as("cell"))

  private def writeGen(g: Long, vectors: DataFrame, ss: Seq[(Long, Seq[Float])]): Unit =
    assign(vectors, ss)
      .select(col("vec_id").cast("long"), col("cell").cast("long"))
      .write.mode("overwrite").parquet(genDir(g))

  /** First ingest: freeze the `nlist` lowest-vec_id vectors as centroids
    * (IVF-flat sampled seeds, [[Similarity.ivfTopK]]'s family), assign
    * every bootstrap vector, commit generation 0. Idempotent.
    */
  def bootstrap(corpus: DataFrame): Unit = if (committedGen < 0) {
    corpus.select(col("vec_id").as("cell_id"), col("embedding"))
      .orderBy(col("cell_id")).limit(nlist)
      .write.mode("overwrite").parquet(seedsDir)
    writeGen(0L, corpus, seeds)
    store.commit("assign", ctx, 0L)
  }

  /** One incremental ingest: assign ONLY `delta` against the frozen
    * centroids and append it as the next committed generation. Cost is
    * delta × nlist multiplies — nothing touches the stored corpus.
    */
  def append(delta: DataFrame): Unit = {
    val g = committedGen
    require(g >= 0, "append before bootstrap: the index has no centroids")
    writeGen(g + 1, delta, seeds)
    store.commit("assign", ctx, g + 1)
  }

  /** Every committed assignment row (vec_id, cell). */
  def assignmentsDf: DataFrame = {
    val g = committedGen
    require(g >= 0, "the index is empty")
    spark.read.parquet((0L to g).map(genDir): _*)
  }

  /** ANN top-k against the stored index: queries score the frozen seeds
    * (driver metadata) to pick `nprobe` cells, the stored assignment scan
    * joins the broadcast probe set on the cell id, and `corpus` supplies
    * embeddings for exactly the candidate rows via one equi-join on
    * vec_id. Identical output to [[Similarity.ivfTopK]] with the same
    * seeds — minus the corpus-wide argmax, which this index exists to
    * never recompute.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val ss = seeds
    require(nprobe >= 1 && nprobe <= ss.size)
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qemb"),
        explode(slice(reverse(array_sort(array(scored(ss)(col("embedding")): _*))),
          1, nprobe)).as("p"))
      .select(col("query_id"), col("qemb"), col("p.cell").as("cell"))
    val cand = assignmentsDf.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(graft.functions.GraftFunctions.cosineSimilarity(
          col("qemb"), col("embedding")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
