package graft

import graft.functions.GraftFunctions
import graft.functions.PolyHash

/** DuckDB SQL fragments that replay the engine's hash/similarity
  * arithmetic exactly, for the driver's oracle compare.
  *
  * Every fragment mirrors a [[graft.functions.GraftFunctions]] /
  * [[graft.operators.Similarity]] primitive operation-for-operation:
  * integer arithmetic is identical by construction, and floating-point
  * reductions are strict left-folds seeded at 0.0 on both sides, so the
  * doubles are bit-identical, not merely close. Constants (MinHash
  * coefficients, hyperplane signs) are generated from the SAME Scala
  * functions the Spark expressions use — there is one source of truth.
  */
object Oracles {
  val P: Long = PolyHash.P

  /** graft.functions.PolyHash over the characters of `e`. */
  def polyHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ord(c) AS BIGINT))), " +
      s"(h, c) -> (h*31 + c) % $P)"

  /** Whitespace tokens, empties dropped (GraftFunctions.tokens). */
  def tokens(e: String): String =
    s"list_filter(string_split_regex($e, '\\s+'), t -> t != '')"

  /** Distinct hashed character n-gram shingles (GraftFunctions.shingleHashes). */
  def shingleHashes(e: String, n: Int): String =
    s"list_distinct(list_transform(" +
      s"list_transform(range(1, length($e) - ${n - 2}), i -> substr($e, i, $n)), " +
      s"g -> ${polyHash("g")}))"

  /** MinHash signature list over a hashed-shingle list column `gs`
    * (GraftFunctions.minhashSignature, identical (a,b) coefficients).
    */
  def minhashSignature(gs: String, k: Int): String =
    GraftFunctions.minhashCoefficients(k).map { case (a, b) =>
      s"list_min(list_transform($gs, h -> (h*$a + $b) % $P))"
    }.mkString("[", ", ", "]")

  /** Band key `bi` of a MinHash signature list column (Dedup.minhashBands). */
  def bandKey(sig: String, bi: Int, rows: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_slice($sig, ${bi * rows + 1}, ${bi * rows + rows})), " +
      s"(acc, v) -> (acc*31 + v) % $P)"

  /** SimHash of a token-hash list column (GraftFunctions.simhash). */
  def simhash(th: String, bits: Int): String =
    (0 until bits).map { b =>
      val vote = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($th, h -> ((h >> $b) & 1) * 2 - 1)), (a, x) -> a + x)"
      s"(CASE WHEN $vote > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Strict-left-fold dot product of two DOUBLE[] columns
    * (GraftFunctions.dotProduct: fold seeded at 0.0).
    */
  def dot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(0, $dim), i -> $a[i+1] * $b[i+1])), (x, y) -> x + y)"

  def l2(a: String, dim: Int): String = s"sqrt(${dot(a, a, dim)})"

  /** Cosine with the same zero-norm guard as GraftFunctions.cosineSimilarity. */
  def cosine(a: String, b: String, dim: Int): String =
    s"(CASE WHEN ${l2(a, dim)} * ${l2(b, dim)} = 0 THEN 0.0 " +
      s"ELSE ${dot(a, b, dim)} / (${l2(a, dim)} * ${l2(b, dim)}) END)"

  /** The ±1 sign of hyperplane component (j, d) as SQL — the identical
    * xor-shift multiply mixer of Similarity.hyperplaneSign inlined as
    * 64-bit integer arithmetic (31-bit states, so no overflow).
    */
  private def mixedSign(idx: String): String = {
    val h1 = s"(($idx) * 2654435761) % 2147483648"
    val h2 = s"xor($h1, ($h1) >> 13)"
    val h3 = s"(($h2) * 2246822519) % 2147483648"
    val h4 = s"xor($h3, ($h3) >> 16)"
    s"(CASE WHEN ($h4) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
  }

  /** Hyperplane-sign bucket bits list (Similarity.bucketKey's projections):
    * element j+1 is 1 iff projection onto ±1-sign plane j is >= 0.
    */
  def hyperplaneBits(v: String, planes: Int, dim: Int): String =
    s"list_transform(range(0, $planes), j -> CASE WHEN " +
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, $dim), d -> " +
      s"$v[d+1] * ${mixedSign(s"CAST(j*$dim + d AS BIGINT)")})), " +
      s"(a, x) -> a + x) >= 0 THEN 1 ELSE 0 END)"

  /** JL sign random projection list (graft.functions.RandomProjection):
    * element j+1 = strict left-fold Σ_d v[d]·sign(first+j, d) over the
    * same mixed ±1 family as the hyperplane buckets.
    */
  def projections(v: String, outDims: Int, dim: Int, first: Int = 0): String =
    s"list_transform(range(0, $outDims), j -> " +
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, $dim), d -> " +
      s"$v[d+1] * ${mixedSign(s"CAST((j+$first)*$dim + d AS BIGINT)")})), " +
      s"(a, x) -> a + x))"

  /** Sampling bucket in [0, buckets): mixed PolyHash of `e`
    * (graft.operators.Sampling.hashBucket — identical constant and
    * modulus, 64-bit-safe).
    */
  def sampleBucket(e: String, buckets: Int): String =
    s"(((${polyHash(e)} * ${graft.operators.Sampling.MixA}) % $P) % $buckets)"

  /** Bucket key of hash table `tblExpr` from a bits list column. */
  def bucketFromBits(bits: String, tblExpr: String, bitsPerTable: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(0, $bitsPerTable), b -> " +
      s"CAST($bits[$tblExpr*$bitsPerTable + b + 1] AS BIGINT) << b)), (a, x) -> a + x)"

  /** [[hyperplaneBits]] with a SQL-DERIVED plane count (`planesExpr`, a
    * scalar subquery over the corpus) — lets the oracle replay the
    * auto-sized LSH families' bits~log2(n) derivation, not just a fixed
    * replay of their output.
    */
  def hyperplaneBitsDyn(v: String, planesExpr: String, dim: Int): String =
    s"list_transform(range(0, $planesExpr), j -> CASE WHEN " +
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, $dim), d -> " +
      s"$v[d+1] * ${mixedSign(s"CAST(j*$dim + d AS BIGINT)")})), " +
      s"(a, x) -> a + x) >= 0 THEN 1 ELSE 0 END)"

  /** [[bucketFromBits]] with a SQL-derived per-table bit width. */
  def bucketFromBitsDyn(bits: String, tblExpr: String,
                        bitsPerTableExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(0, $bitsPerTableExpr), b -> " +
      s"CAST($bits[$tblExpr*($bitsPerTableExpr) + b + 1] AS BIGINT) << b)), " +
      s"(a, x) -> a + x)"

  /** DSIR importance log-weights over `documents` with target = the
    * English sub-corpus (graft.operators.Sampling.dsirLogWeights):
    * hashed unigram+bigram features folded into `buckets` via
    * [[sampleBucket]], +0.5-smoothed target/pool multinomials, and the
    * per-document sum carried as exact integer micro-nats so aggregation
    * order can never move the rounded result. Yields
    * (doc_id, is_target, n_feats, log_weight); composes as a CTE body.
    */
  def dsirWeights(buckets: Int): String =
    s"""WITH base AS (
       |  SELECT doc_id, (lang = 'en') AS is_target, lower(text) AS t
       |  FROM documents),
       |toks AS (SELECT doc_id, is_target, ${tokens("t")} AS tk FROM base),
       |uni AS (SELECT doc_id, is_target, unnest(tk) AS term FROM toks),
       |bi AS (
       |  SELECT doc_id, is_target,
       |    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS term
       |  FROM toks WHERE len(tk) >= 2),
       |feats AS (
       |  SELECT doc_id, is_target, ${sampleBucket("term", buckets)} AS f
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
       |cnt AS (SELECT doc_id, is_target, f, count(*) AS c FROM feats GROUP BY 1, 2, 3),
       |fc AS (
       |  SELECT f, sum(CASE WHEN is_target THEN c ELSE 0 END) AS tc, sum(c) AS pc
       |  FROM cnt GROUP BY 1),
       |tot AS (SELECT sum(tc) AS tct, sum(pc) AS pct FROM fc),
       |lr AS (
       |  SELECT f, CAST(round((ln((tc + 0.5) / (tct + 0.5 * $buckets))
       |    - ln((pc + 0.5) / (pct + 0.5 * $buckets))) * 1000000) AS BIGINT) AS lrq
       |  FROM fc, tot)
       |SELECT doc_id, is_target, CAST(sum(c) AS BIGINT) AS n_feats,
       |  sum(c * lrq) / 1000000.0 AS log_weight
       |FROM cnt JOIN lr USING (f) GROUP BY 1, 2""".stripMargin
}
