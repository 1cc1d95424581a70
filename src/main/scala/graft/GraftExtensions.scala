package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.functions._

/** [[SparkSessionExtensions]] hook that registers the engine's native
  * Catalyst kernels as SQL functions, so `spark.sql` users get the same
  * codegen'd primitives the Column API exposes
  * (`SELECT poly_hash(text), simhash64(text, 16) FROM docs`):
  *
  *  - `poly_hash(str)`, `token_hashes(str)`, `shingle_hashes(str, n)`
  *  - `minhash_sig(array<long>, k)`, `simhash64(str, bits)`
  *  - `dot_product(a, b)`, `cosine_sim(a, b)`,
  *    `hyperplane_buckets(emb, tables, bits)`
  *  - aggregates `top_k_agg(id, value, k)`,
  *    `heavy_hitters_agg(item, k)`
  *
  * Wired into every session by [[GraftSession.builder]] via
  * `.withExtensions` — the idiomatic extension point (no fork, no
  * session-state hacks); sizing arguments must be literal integers, like
  * the built-in `approx_percentile`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: sizing argument must be a literal integer, got $e")
  }

  private def str(e: Expression): Expression = Cast(e, StringType)

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("poly_hash", "portable polynomial string hash mod 2^31-1") {
      args => PolyHash(str(args.head))
    })
    ext.injectFunction(fn("token_hashes", "poly_hash of each whitespace token") {
      args => TokenHashesExpr(str(args.head))
    })
    ext.injectFunction(fn("shingle_hashes", "distinct hashed character n-grams") {
      args => ShingleHashesExpr(str(args(0)), intArg(args(1), "shingle_hashes"))
    })
    ext.injectFunction(fn("minhash_sig", "MinHash signature of a hash set") {
      args => MinHashSignatureExpr(args(0), intArg(args(1), "minhash_sig"))
    })
    ext.injectFunction(fn("simhash64", "SimHash of a string's tokens") {
      args => SimHashExpr(TokenHashesExpr(str(args(0))), intArg(args(1), "simhash64"))
    })
    ext.injectFunction(fn("dot_product", "float-array dot product in double precision") {
      args => DotProduct(args(0), args(1))
    })
    ext.injectFunction(fn("cosine_sim", "cosine similarity, 0 on zero norm") {
      args => CosineSimilarity(args(0), args(1))
    })
    ext.injectFunction(fn("hyperplane_buckets", "LSH bucket key per hash table") {
      args => HyperplaneBuckets(args(0),
        intArg(args(1), "hyperplane_buckets"), intArg(args(2), "hyperplane_buckets"))
    })
    ext.injectFunction(fn("top_k_agg", "exact mergeable top-k (value desc, id asc)") {
      args => TopKImperative(Cast(args(0), LongType),
        Cast(args(1), org.apache.spark.sql.types.DoubleType), intArg(args(2), "top_k_agg"))
    })
    ext.injectFunction(fn("heavy_hitters_agg", "Misra-Gries heavy hitters") {
      args => HeavyHittersAgg(str(args(0)), intArg(args(1), "heavy_hitters_agg"))
    })
  }
}
