package graft

import org.apache.spark.sql.functions._
import graft.sources.{BpeVocabStore, DsirModelStore, IvfIndex, IvfPqIndex,
  LshBandIndex, PqIndex}

/** FAISS-header discipline (r11 advice, medium): every persisted store
  * stamps its fit-time hyperparameters into the bookmark file in the same
  * atomic rename as the fit commit, and reopening the artifact with a
  * drifted constructor argument fails at open — never a silent mis-score
  * (DSIR's inner join would drop features hashed past the fitted bucket
  * count; PQ lookups would read codebook entries that were never trained).
  */
class StoreParamsSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang"), col("text"))
  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))
    .filter(col("vec_id") < 64)

  test("DsirModelStore: reopening with a different bucket count refuses") {
    val dir = TempDirs.create("params-dsir")
    new DsirModelStore(spark, dir, buckets = 256).fit(docs, col("lang") === "en")
    val e = intercept[IllegalArgumentException] {
      new DsirModelStore(spark, dir, buckets = 512)
    }
    assert(e.getMessage.contains("buckets=256"))
    // the fitted value still opens and reads
    assert(new DsirModelStore(spark, dir, buckets = 256).modelDf.count() === 256L)
  }

  test("PqIndex: reopening with different m or codes refuses") {
    val dir = TempDirs.create("params-pq")
    new PqIndex(spark, dir, m = 8, codes = 8).bootstrap(vecs, iters = 1)
    intercept[IllegalArgumentException] { new PqIndex(spark, dir, m = 4, codes = 8) }
    intercept[IllegalArgumentException] { new PqIndex(spark, dir, m = 8, codes = 16) }
    assert(new PqIndex(spark, dir, m = 8, codes = 8).committedGen === 0L)
  }

  test("IvfPqIndex: reopening with a different nlist refuses") {
    val dir = TempDirs.create("params-ivfpq")
    new IvfPqIndex(spark, dir, nlist = 8, m = 8, codes = 8)
      .bootstrap(vecs, iters = 1)
    intercept[IllegalArgumentException] {
      new IvfPqIndex(spark, dir, nlist = 16, m = 8, codes = 8)
    }
    assert(new IvfPqIndex(spark, dir, nlist = 8, m = 8, codes = 8)
      .committedGen === 0L)
  }

  test("IvfIndex / LshBandIndex / BpeVocabStore stamp and validate too") {
    val d1 = TempDirs.create("params-ivf")
    new IvfIndex(spark, d1, nlist = 8).bootstrap(vecs)
    intercept[IllegalArgumentException] { new IvfIndex(spark, d1, nlist = 4) }

    val d2 = TempDirs.create("params-lsh")
    new LshBandIndex(spark, d2, n = 2, k = 8, bands = 4).bootstrap(docs.limit(50))
    intercept[IllegalArgumentException] {
      new LshBandIndex(spark, d2, n = 3, k = 8, bands = 4)
    }

    val d3 = TempDirs.create("params-bpe")
    new BpeVocabStore(spark, d3, rounds = 2).fit(docs.limit(50))
    intercept[IllegalArgumentException] { new BpeVocabStore(spark, d3, rounds = 3) }
  }

  test("an unstamped (pre-discipline) artifact stays readable") {
    // simulate a legacy store: fit, then strip the param slots by
    // rewriting the properties file without them
    val dir = TempDirs.create("params-legacy")
    new DsirModelStore(spark, dir, buckets = 256).fit(docs, col("lang") === "en")
    val f = java.nio.file.Paths.get(dir, "bookmarks.properties")
    val kept = java.nio.file.Files.readAllLines(f).stream()
      .filter(l => !l.contains("param.")).toArray.mkString("\n")
    java.nio.file.Files.writeString(f, kept)
    // no stamp -> nothing to validate against, any bucket count opens
    assert(new DsirModelStore(spark, dir, buckets = 999).committed)
  }
}
