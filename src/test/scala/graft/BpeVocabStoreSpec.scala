package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.BpeVocabStore

/** The persisted BPE vocabulary must encode deltas exactly like full
  * train-and-encode (per-doc rewriting under a fixed merge list is
  * independent across documents), fold fewer-than-`rounds` merges when
  * training exhausts the corpus, and honor the fit-once commit
  * discipline.
  */
class BpeVocabStoreSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))
  private def enc(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select(col("doc_id"), array_join(col("toks"), "|").as("e"))
      .as[(Long, String)].collect().toSeq.sorted

  test("frozen-vocab delta encode equals full train-and-encode, token for token") {
    val store = new BpeVocabStore(spark, TempDirs.create("bpe-store"), rounds = 3)
    store.fit(docs)
    val delta = docs.filter(col("doc_id") % 50 === 0)
    val got = enc(store.encode(delta))
    val expected = enc(TextAnalysis.bpeEncode(docs, rounds = 3)
      .filter(col("doc_id") % 50 === 0))
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("training that exhausts the corpus early still encodes (shorter merge list)") {
    // two docs, two tokens each: round 1 merges each doc to one token,
    // round 2+ find no adjacent pairs — fit commits fewer merges than
    // asked and encode folds exactly what was learned
    val tiny = Seq((1L, "aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val store = new BpeVocabStore(spark, TempDirs.create("bpe-store2"), rounds = 5)
    store.fit(tiny)
    assert(store.mergesDf.count() < 5)
    val out = enc(store.encode(tiny))
    assert(out === Seq((1L, "aa bb"), (2L, "aa bb"))) // merged, space-joined
  }

  test("fit is idempotent and encoding before fitting refuses") {
    val store = new BpeVocabStore(spark, TempDirs.create("bpe-store3"), rounds = 2)
    intercept[IllegalArgumentException] { store.mergesDf }
    store.fit(docs)
    val first = store.mergesDf.select(col("round"), col("pair_a"), col("pair_b"))
      .as[(Int, String, String)].collect().toSeq.sorted
    store.fit(docs.limit(3)) // second fit must be a no-op
    assert(store.mergesDf.select(col("round"), col("pair_a"), col("pair_b"))
      .as[(Int, String, String)].collect().toSeq.sorted === first)
  }
}
