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
  * Wired into every session by [[GraftSession.builder]] via
  * `.withExtensions`; cluster-wide deployment can equivalently set
  * `spark.sql.extensions=graft.GraftExtensions` (no code changes in user
  * jobs). Sizing arguments (k, n, bits, tables) must be integer literals,
  * like the built-in `approx_percentile`.
  *
  * Functions: `poly_hash(str)`, `token_hashes(str)`,
  * `shingle_hashes(str, n)`, `minhash_signature(hashes, k)` (alias
  * `minhash_sig`), `simhash(token_hashes, bits)`,
  * `simhash64(str, bits)` (tokenize + simhash in one call),
  * `dot_product(a, b)`, `cosine_similarity(a, b)` (alias `cosine_sim`),
  * `hyperplane_buckets(emb, tables, bits)`, and the aggregates
  * `top_k(id, value, k)` (alias `top_k_agg`) /
  * `heavy_hitters(item, k)` (alias `heavy_hitters_agg`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def register(ext: SparkSessionExtensions, usage: String,
                       names: Seq[String])(builder: Seq[Expression] => Expression): Unit =
    names.foreach { name =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: cosine against a constant vector gets its norm
    // folded at plan time (graft.plans.PrenormalizeLiteralCosine)
    ext.injectOptimizerRule(_ => graft.plans.PrenormalizeLiteralCosine)

    register(ext, "poly_hash(str) - portable polynomial string hash mod 2^31-1",
      Seq("poly_hash"))(args => PolyHash(Cast(args.head, StringType)))

    register(ext, "cosine_similarity(a, b) - cosine of two float arrays",
      Seq("cosine_similarity", "cosine_sim"))(
      args => CosineSimilarity(args(0), args(1)))

    register(ext, "dot_product(a, b) - float-array dot product in double precision",
      Seq("dot_product"))(args => DotProduct(args(0), args(1)))

    register(ext, "shingle_hashes(str, n) - distinct hashed character n-grams",
      Seq("shingle_hashes"))(
      args => ShingleHashesExpr(Cast(args(0), StringType), foldInt(args(1))))

    register(ext, "token_hashes(str) - poly_hash of each whitespace token",
      Seq("token_hashes"))(args => TokenHashesExpr(Cast(args.head, StringType)))

    register(ext, "minhash_signature(hashes, k) - k-hash MinHash signature",
      Seq("minhash_signature", "minhash_sig"))(
      args => MinHashSignatureExpr(args(0), foldInt(args(1))))

    register(ext, "simhash(token_hashes, bits) - bitwise majority simhash",
      Seq("simhash"))(args => SimHashExpr(args(0), foldInt(args(1))))

    register(ext, "simhash64(str, bits) - tokenize + simhash in one call",
      Seq("simhash64"))(
      args => SimHashExpr(TokenHashesExpr(Cast(args(0), StringType)), foldInt(args(1))))

    register(ext,
      "hyperplane_buckets(embedding, tables, bits) - LSH bucket key per hash table",
      Seq("hyperplane_buckets"))(
      args => HyperplaneBuckets(args(0), foldInt(args(1)), foldInt(args(2))))

    // the aggregates read their children as long/double/UTF8String, so
    // SQL arguments get the same canonicalizing casts as the Scala
    // wrappers in GraftFunctions — an INT id would otherwise CCE mid-job
    register(ext, "top_k(id, value, k) - exact mergeable top-k (value desc, id asc)",
      Seq("top_k", "top_k_agg"))(
      args => TopKImperative(
        Cast(args(0), LongType), Cast(args(1), DoubleType), foldInt(args(2))))

    register(ext,
      "heavy_hitters(item, k) - Misra-Gries frequent items, <= k bounded counters",
      Seq("heavy_hitters", "heavy_hitters_agg"))(
      args => HeavyHittersAgg(Cast(args(0), StringType), foldInt(args(1))))

    register(ext,
      "bpe_merge_pair(toks, a, b) - one BPE merge round: leftmost non-overlapping (a, b) -> 'a b'",
      Seq("bpe_merge_pair"))(
      args => BpeMergePairExpr(args(0), foldString(args(1)), foldString(args(2))))

    register(ext,
      "adjacency_count(a, b[, max_gap]) - |{p in a : p < q <= p+max_gap for some q in b}| over sorted int lists",
      Seq("adjacency_count"))(args => AdjacencyCountExpr(args(0), args(1),
        if (args.length > 2) foldInt(args(2)) else 1))
  }

  /** Static-string arguments (merge pair sides) must be literals at parse
    * time, like [[foldInt]]'s k/bits/n.
    */
  private def foldString(e: Expression): String = e.eval(null) match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(
      s"expected a string literal argument, got $other")
  }

  /** Static-int arguments (k, bits, n) must be literals at parse time. */
  private def foldInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }
}
