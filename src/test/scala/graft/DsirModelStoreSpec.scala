package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.DsirModelStore

/** The persisted DSIR model must score and select deltas exactly like
  * fit-then-score, be complete over the feature space (novel-delta
  * exactness — the round-11 advice fix), and honor the fit-once commit
  * discipline.
  */
class DsirModelStoreSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang"), col("text"))
  private def delta = docs.filter(col("doc_id") % 50 === 0)

  test("applyTo/selectFrom equal fit-then-score over the same delta, bit for bit") {
    val store = new DsirModelStore(spark, TempDirs.create("dsir-store"), buckets = 512)
    store.fit(docs, col("lang") === "en")
    val applied = store.applyTo(delta)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val expected = Sampling.dsirLogWeights(docs, col("lang") === "en", 512)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("n_feats"), col("log_weight"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(expected.nonEmpty)
    assert(applied === expected)
    val selected = store.selectFrom(delta, k = 5)
      .as[(Long, Double, Double, Double)].collect().toSeq.sorted
    val fresh = Sampling.dsirSelectApplied(delta,
        Sampling.dsirModel(docs, col("lang") === "en", 512), 512, k = 5)
      .as[(Long, Double, Double, Double)].collect().toSeq.sorted
    assert(selected.length === 5)
    assert(selected === fresh)
  }

  test("the model is complete over all B buckets: a novel-token delta still scores") {
    val corpus = Seq(
      (1L, true, "alpha beta gamma alpha"),
      (2L, false, "delta epsilon zeta"),
      (3L, false, "eta theta iota kappa")).toDF("doc_id", "tgt", "text")
    val model = Sampling.dsirModel(corpus, col("tgt"), 256)
    assert(model.count() === 256L) // every bucket present, seen or not
    // a delta of entirely novel tokens: every feature hashes to buckets
    // the corpus may never have populated — the complete model must
    // still count ALL of them (4 unigrams + 3 bigrams = 7 features)
    val novel = Seq((9L, "qqxx wwyy eezz rrvv")).toDF("doc_id", "text")
    val out = Sampling.dsirApply(novel, model, 256)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) === Seq(7L))
    assert(out.head._3 < 0 || out.head._3 > 0) // finite, non-NaN score
  }

  test("fit is idempotent and applying before fitting refuses") {
    val store = new DsirModelStore(spark, TempDirs.create("dsir-store2"), buckets = 256)
    intercept[IllegalArgumentException] { store.modelDf }
    store.fit(docs, col("lang") === "en")
    val first = store.modelDf.as[(Long, Long)].collect().toSeq.sorted
    store.fit(docs, col("lang") =!= "en") // second fit must be a no-op
    assert(store.modelDf.as[(Long, Long)].collect().toSeq.sorted === first)
  }
}
