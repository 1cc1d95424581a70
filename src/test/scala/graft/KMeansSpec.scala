package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.operators.KMeans

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  test("two obvious groups separate; seeds are the lowest vec_ids") {
    // ids 0,1 seed the two clusters; 2-5 sit near one seed each
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)), (3L, Seq(0.1f, 0.9f, 0f, 0f)),
      (4L, Seq(0.8f, 0f, 0.1f, 0f)), (5L, Seq(0f, 0.8f, 0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val got = KMeans.assign(vecs, 2, 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 2L -> 0, 4L -> 0, 1L -> 1, 3L -> 1, 5L -> 1))
  }

  test("every vector is assigned exactly once with a valid cosine") {
    val emb = Tables.embeddings(spark, sf)
    val out = KMeans.assign(emb, 8, 2).cache()
    try {
      assert(out.count() == emb.count())
      assert(out.select("vec_id").distinct().count() == emb.count())
      assert(out.where(col("cluster") < 0 || col("cluster") >= 8).count() == 0)
      assert(out.where(col("cosine") < -1.0 || col("cosine") > 1.0).count() == 0)
    } finally out.unpersist()
  }

  test("single round equals a cross-join argmax over the seed centroids") {
    val emb = Tables.embeddings(spark, sf)
    val seeds = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id"), col("embedding"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }.toSeq
    val seedDf = seeds.toDF("c", "cv")
    val composed = emb.crossJoin(broadcast(seedDf))
      .withColumn("cs", cosineSimilarity(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cs").desc, col("c"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("c").as("cluster"))
    val got = KMeans.assign(emb, 8, 1).select("vec_id", "cluster")
    assert(got.except(composed).isEmpty && composed.except(got).isEmpty)
  }

  test("assignment is map-only: no exchange in the returned plan") {
    val plan = KMeans.assign(Tables.embeddings(spark, sf), 8, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }
}
