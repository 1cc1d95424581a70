package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Deterministic Lloyd's k-means over an embedding column — the
  * clustering stage of a training-data pipeline (topic bucketing,
  * diversity sampling, IVF coarse quantizers).
  *
  * Determinism choices, so every run AND the SQL oracle replay
  * bit-identically:
  *  - centroids seed from the `k` lowest `vec_id`s (like
  *    [[Similarity.ivfTopK]] — no RNG);
  *  - assignment = argmax cosine, ties to the lowest cluster id;
  *  - updated centroids are `round(mean, 6)` then quantized to float —
  *    both engines then hold the exact same IEEE value, so the next
  *    iteration's argmax cannot drift on fold-order noise;
  *  - a cluster that loses all members keeps its previous centroid.
  *
  * Scale shape per iteration: assignment is MAP-ONLY — centroids are
  * driver literals (O(k·d) metadata, like a bookmark commit), inlined
  * into one codegen'd `greatest` over native cosine kernels, no per-row
  * join. The mean update is one partial-aggregating shuffle keyed
  * (cluster, dim): the exchange carries k·d rows per input partition,
  * never the vectors. Driver traffic per iteration is the k·d centroid
  * matrix — at 100 TB the corpus is only ever streamed, `iters` times.
  */
object KMeans {

  // (cosine, -cluster, cluster) structs: lexicographic greatest = best
  // cosine, ties to the lowest cluster id (the ivfTopK pattern)
  private def best(cs: Map[Int, Seq[Float]]): Column =
    greatest(cs.toSeq.sortBy(_._1).map { case (c, v) =>
      struct(cosineSimilarity(col("embedding"), typedlit(v)).as("cs"),
        lit(-c).as("nc"), lit(c).as("cluster"))
    }: _*)

  /** The trained centroid matrix after `iters` argmax rounds (so
    * `iters - 1` mean updates) — O(k·d) driver metadata.
    */
  private def train(emb: DataFrame, k: Int, iters: Int): Map[Int, Seq[Float]] = {
    var centroids: Map[Int, Seq[Float]] = emb
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(k)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1) }.toMap

    for (_ <- 1 until iters) {
      val means = emb
        .select(best(centroids).getField("cluster").as("cluster"),
          posexplode(col("embedding")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster"),
          transform(col("pm"), x => x.getField("m").cast("float")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      centroids = centroids.map { case (c, old) => c -> means.getOrElse(c, old) }
    }
    centroids
  }

  /** Cluster assignments after `iters` argmax rounds (so `iters - 1`
    * centroid updates). Output: vec_id, cluster, cosine (to the final
    * centroid, rounded 6).
    */
  def assign(emb: DataFrame, k: Int, iters: Int): DataFrame =
    assignFull(emb, k, iters).drop("embedding")

  /** Like [[assign]] but keeps the embedding column, for downstream
    * similarity work over the clustered corpus (hard-negative mining,
    * diversity sampling) — same map-only argmax plan, no extra pass.
    */
  def assignFull(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 2 && iters >= 1)
    val centroids = train(emb, k, iters)
    // materialize the argmax struct once (CollapseProject keeps non-cheap
    // expressions un-duplicated), then read both fields from it
    emb.select(col("vec_id"), col("embedding"), best(centroids).as("_b"))
      .select(col("vec_id"), col("embedding"),
        col("_b.cluster").as("cluster"),
        round(col("_b.cs"), 6).as("cosine"))
  }
}
