package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.LmStore

/** The persisted bigram LM must score deltas exactly like fit-then-score
  * (the oracle-gated equality), back off — never drop — unseen bigrams
  * for a genuinely novel delta, and honor the fit-once commit discipline.
  */
class LmStoreSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  test("scoreDelta equals fit-then-score over the same delta, bit for bit") {
    val store = new LmStore(spark, TempDirs.create("lm-store"))
    store.fit(docs)
    val got = store.scoreDelta(docs.filter(col("doc_id") % 50 === 0))
      .as[(Long, Long, Double, Double)].collect().toSeq.sorted
    val expected = TextAnalysis.perplexity(docs)
      .filter(col("doc_id") % 50 === 0)
      .as[(Long, Long, Double, Double)].collect().toSeq.sorted
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("a novel delta backs off instead of dropping: all bigrams counted") {
    val corpus = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val store = new LmStore(spark, TempDirs.create("lm-store2"))
    store.fit(corpus)
    assert(store.vocabSize === 3L) // a, b, c
    // (a,b) seen: MLE 0.5; (b,a)/(d,e)/(e,f) novel context: 1/V;
    // (a,d) unseen pair under seen context a (tot 2): 0.5/(2+0.5*3)
    val out = store.scoreDelta(Seq((9L, "a b a d e f")).toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._2) === Seq(5L)) // every bigram scored, none dropped
    val probs = Seq(0.5, 1.0 / 3, 0.5 / 3.5, 1.0 / 3, 1.0 / 3)
      .map(p => math.log(BigDecimal(p).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
    val expAvg = BigDecimal(probs.sum / probs.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._3 === expAvg)
  }

  test("fit is idempotent and scoring before fitting refuses") {
    val store = new LmStore(spark, TempDirs.create("lm-store3"))
    intercept[IllegalArgumentException] { store.lmDf }
    store.fit(docs)
    val v = store.vocabSize
    store.fit(docs.limit(3)) // second fit must be a no-op
    assert(store.vocabSize === v)
  }
}
