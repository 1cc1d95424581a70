package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT poly_hash(text) ...")`
  * works anywhere the library is on the classpath.
  *
  * Wire up via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` (the standard mechanism for
  * cluster-wide deployment — no code changes in user jobs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(str) - portable polynomial string hash mod 2^31-1"),
      (args: Seq[Expression]) => PolyHash(args.head)))

    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(str, n) - distinct hashed character n-grams"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0), foldInt(args(1)))))

    ext.injectFunction((FunctionIdentifier("token_hashes"),
      info("token_hashes", "token_hashes(str) - poly_hash of each whitespace token"),
      (args: Seq[Expression]) => TokenHashesExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(hashes, k) - k-hash MinHash signature"),
      (args: Seq[Expression]) => MinHashSignatureExpr(args(0), foldInt(args(1)))))

    ext.injectFunction((FunctionIdentifier("simhash"),
      info("simhash", "simhash(token_hashes, bits) - bitwise majority simhash"),
      (args: Seq[Expression]) => SimHashExpr(args(0), foldInt(args(1)))))

    ext.injectFunction((FunctionIdentifier("hyperplane_buckets"),
      info("hyperplane_buckets",
        "hyperplane_buckets(embedding, tables, bits) - LSH bucket key per hash table"),
      (args: Seq[Expression]) => HyperplaneBuckets(args(0), foldInt(args(1)), foldInt(args(2)))))

    // the aggregates read their children as long/double/UTF8String, so
    // SQL arguments get the same canonicalizing casts as the Scala
    // wrappers in GraftFunctions — an INT id would otherwise CCE mid-job
    ext.injectFunction((FunctionIdentifier("top_k"),
      info("top_k", "top_k(id, value, k) - exact mergeable top-k (value desc, id asc)"),
      (args: Seq[Expression]) => TopKImperative(
        Cast(args(0), LongType), Cast(args(1), DoubleType), foldInt(args(2)))))

    ext.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(item, k) - Misra-Gries frequent items, <= k bounded counters"),
      (args: Seq[Expression]) => HeavyHittersAgg(
        Cast(args(0), StringType), foldInt(args(1)))))
  }

  /** Static-int arguments (k, bits, n) must be literals at parse time. */
  private def foldInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }
}
