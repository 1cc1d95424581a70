package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("langId: marker argmax with ties broken by declaration order, und when none") {
    val got = Seq(
      "the cat and the dog of a house",  // en
      "der hund und die katze ist da",   // de
      "el perro y los gatos que es",     // es
      "xyzzy plugh quux",                // no markers anywhere
      "THE AND OF"                       // case-insensitive en
    ).toDF("text").select(TextAnalysis.langId(col("text")).as("l")).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "es", "und", "en"))
  }

  test("quality features: token/char counts and ratios") {
    val df = TextAnalysis.qualityFeatures(
      Seq("the quick fox. really!").toDF("text"), col("text"))
    val r = df.select("n_tokens", "n_chars_measured", "punct_ratio", "stopword_ratio")
      .as[(Int, Int, Double, Double)].collect()(0)
    assert(r._1 == 4)
    assert(r._2 == 22)
    assert(r._3 == math.rint(2.0 / 22 * 10000) / 10000)
    assert(r._4 == 0.25) // "the" of 4 tokens
  }

  test("quality features survive an empty string") {
    val r = TextAnalysis.qualityFeatures(Seq("").toDF("text"), col("text"))
      .select("n_tokens", "quality_score").as[(Int, Double)].collect()(0)
    assert(r == ((0, 0.0)))
  }

  test("token counts: whitespace vs BPE-ish split") {
    val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
    val r = Seq("hello world, it's 42").toDF("text")
      .select(ws.as("ws"), bpe.as("bpe")).as[(Int, Int)].collect()(0)
    // ws: [hello, world,, it's, 42]; bpe: [hello, world, ',', it, ', s, 42]
    assert(r._1 == 4)
    assert(r._2 == 7)
  }

  test("fingerprint equals poly_hash of the text") {
    val r = Seq("abc").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f")).as[Long].collect()(0)
    assert(r == graft.functions.PolyHash.hash("abc"))
  }

  test("fused stats equals the composed formulation bit-for-bit") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).limit(200)
    val fused = TextAnalysis.stats(docs).drop("text").orderBy("doc_id")
    val (_, bpe) = TextAnalysis.tokenCounts(col("text"))
    val composed = TextAnalysis.qualityFeatures(docs, col("text"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("bpe_tokens", bpe)
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .drop("text").orderBy("doc_id")
    assert(fused.columns.toSeq == composed.columns.toSeq)
    assert(fused.except(composed).isEmpty && composed.except(fused).isEmpty)
  }

  test("tfidf top terms on a hand-computed corpus") {
    val docs = Seq((1L, "a b b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, 2L, 2)
      .select("doc_id", "rank", "term", "tf", "df", "tfidf")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSet
    // ln 2 = 0.6931471...: round(2 * ln 2, 4) = 1.3863, round(ln 2, 4) = 0.6931
    assert(got == Set(
      (1L, 1, "b", 2L, 1L, 1.3863),
      (1L, 2, "a", 1L, 2L, 0.0),
      (2L, 1, "c", 1L, 1L, 0.6931),
      (2L, 2, "a", 1L, 2L, 0.0)))
  }

  test("tfidf plan: map-side combine on (doc, term); vocabulary join broadcasts") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = TextAnalysis.tfIdfTopTerms(docs, 100L, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"token occurrences must combine before the shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"df join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }
}
