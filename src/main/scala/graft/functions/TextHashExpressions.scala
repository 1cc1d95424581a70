package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hash primitives for the dedup operators.
  *
  * Each replaces a composed higher-order-function column (interpreted,
  * boxed lambdas per element) with one tight loop, while producing
  * element-for-element identical results — the specs pin equality against
  * the composed formulations and the DuckDB oracles replay the same
  * arithmetic. ASCII-exact: like the composed versions, hashing walks
  * UTF-16 code units, which coincides with the oracle's per-character ord()
  * on ASCII corpora.
  */

/** Distinct [[PolyHash]]-hashed character n-gram shingles, first-occurrence
  * order (== array_distinct(transform(shingles(c, n), poly_hash))).
  */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.compute(input.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashesExpr.compute($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashesExpr {
  def compute(s: String, n: Int): ArrayData = {
    val m = s.length - n
    if (m < 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= m) {
      var h = 0L
      var j = i
      while (j < i + n) { h = (h * 31 + s.charAt(j)) % PolyHash.P; j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}

/** [[PolyHash]] of each whitespace token, order preserved, duplicates kept
  * (== transform(tokens(c), poly_hash)).
  */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenHashesExpr.compute(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashesExpr.compute($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "token_hashes"
}

object TokenHashesExpr {
  def compute(s: String): ArrayData = {
    val toks = s.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) out += PolyHash.hash(toks(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** MinHash signature of a hashed-shingle array under the deterministic
  * universal-hash family of GraftFunctions.minhashCoefficients
  * (== array(array_min(transform(hs, h => (h*a_i + b_i) % P)) for i < k)).
  * Empty input yields null signature elements, like array_min of empty.
  */
case class MinHashSignatureExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignatureExpr.compute($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignatureExpr {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  def coeffs(k: Int): Array[(Long, Long)] =
    cache.computeIfAbsent(k, kk => GraftFunctions.minhashCoefficients(kk).toArray)

  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val cs = coeffs(k)
    val n = hashes.numElements()
    val out = new Array[Any](k)
    if (n == 0) return new GenericArrayData(out) // nulls, like array_min([])
    var i = 0
    while (i < k) {
      val (a, b) = cs(i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (hashes.getLong(j) * a + b) % PolyHash.P
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Word n-grams over whitespace tokens, space-joined, order preserved,
  * duplicates kept (== zip_with over slices of tokens(c) for n = 2).
  * Fewer than n tokens yields an empty array. One tight loop instead of
  * the composed slice/zip_with HOF chain, which is CodegenFallback and
  * re-tokenizes the string once per reference to the token array.
  */
case class TokenNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenNgramsExpr.compute(input.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenNgramsExpr.compute($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenNgramsExpr =
    copy(child = newChild)
  override def prettyName: String = "token_ngrams"
}

object TokenNgramsExpr {
  def compute(s: String, n: Int): ArrayData = {
    // same tokenizer as TokenHashesExpr/GraftFunctions.tokens: java-regex
    // \s+ split, empties dropped
    val raw = s.split("\\s+")
    val toks = new scala.collection.mutable.ArrayBuffer[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) toks += raw(i)
      i += 1
    }
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** [[PolyHash]]-style rolling hash of every `spanLen`-token window of a
  * token-hash array, stride 1 (== transform(sequence(1, n-spanLen+1),
  * i => aggregate(slice(th, i, spanLen), 0L, (acc,h) => (acc*31+h) % P))).
  * Fewer than `spanLen` tokens yields an empty array.
  *
  * One O(n) pass: window i+1 drops token i via the precomputed
  * 31^(spanLen-1) mod P term instead of re-folding the slice, so the cost
  * is independent of the span length — the composed HOF form is O(n*L)
  * AND CodegenFallback. All intermediates stay below 2^62 (P = 2^31-1).
  */
case class SpanHashesExpr(child: Expression, spanLen: Int) extends UnaryExpression {
  require(spanLen >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SpanHashesExpr.compute(input.asInstanceOf[ArrayData], spanLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHashesExpr.compute($c, $spanLen)")
  override protected def withNewChildInternal(newChild: Expression): SpanHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "span_hashes"
}

object SpanHashesExpr {
  def compute(tokenHashes: ArrayData, spanLen: Int): ArrayData = {
    val p = PolyHash.P
    val n = tokenHashes.numElements()
    val m = n - spanLen + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // 31^(spanLen-1) mod P: the weight of the departing leading token
    var pow = 1L
    var i = 1
    while (i < spanLen) { pow = (pow * 31) % p; i += 1 }
    val out = new Array[Any](m)
    var h = 0L
    var j = 0
    while (j < spanLen) { h = (h * 31 + tokenHashes.getLong(j)) % p; j += 1 }
    out(0) = h
    var s = 1
    while (s < m) {
      val drop = (tokenHashes.getLong(s - 1) * pow) % p
      h = (((h - drop + p) % p) * 31 + tokenHashes.getLong(s + spanLen - 1)) % p
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** SimHash over a token-hash array (== GraftFunctions.simhash composed
  * column): bit b set iff sum over tokens of (2*((h>>b)&1) - 1) > 0.
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "simhash"
}

object SimHashExpr {
  def compute(tokenHashes: ArrayData, bits: Int): Long = {
    val n = tokenHashes.numElements()
    val votes = new Array[Long](bits)
    var j = 0
    while (j < n) {
      val h = tokenHashes.getLong(j)
      var b = 0
      while (b < bits) {
        votes(b) += ((h >> b) & 1L) * 2 - 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** One BPE merge round applied to a token array: every leftmost
  * non-overlapping occurrence of the adjacent pair `(a, b)` is replaced by
  * the space-joined merged token — the per-document rewrite step of BPE
  * training/encoding ([[graft.operators.TextAnalysis.bpeMergeRounds]]).
  *
  * Greedy left-to-right scan with skip-2 on match, which is exactly the
  * "even offsets within each maximal run of match positions" semantics the
  * DuckDB oracle replays via gaps-and-islands: with a != b two adjacent
  * positions can never both match (pos p+1 matching forces b = a), and
  * with a == b a run of equal tokens merges at even offsets — precisely
  * what the skip-2 scan produces.
  *
  * This is the 100 TB shape for the rewrite: one O(n) pass per document
  * inside WholeStageCodegen, no posexplode, no per-doc window sort, no
  * regroup shuffle — the only shuffle a BPE round needs is the pair-count
  * aggregation that picks the winner.
  */
case class BpeMergePairExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {
  // containsNull follows the child: compute() passes null input elements
  // straight through (a.equals(null) is false, so they never match the
  // pair), and bpe_merge_pair is SQL-registered — a user-supplied
  // array('a', NULL) must not carry a non-nullable element type into
  // downstream codegen.
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }
  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val um = UTF8String.fromString(a + " " + b)
  override def nullSafeEval(input: Any): Any =
    BpeMergePairExpr.compute(input.asInstanceOf[ArrayData], ua, ub, um)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String"
    val aRef = ctx.addReferenceObj("bpeA", ua, cls)
    val bRef = ctx.addReferenceObj("bpeB", ub, cls)
    val mRef = ctx.addReferenceObj("bpeMerged", um, cls)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeMergePairExpr.compute($c, $aRef, $bRef, $mRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMergePairExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_merge_pair"
}

object BpeMergePairExpr {
  def compute(arr: ArrayData, a: UTF8String, b: UTF8String,
              merged: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (i + 1 < n && a.equals(t) && b.equals(arr.getUTF8String(i + 1))) {
        out(k) = merged
        i += 2
      } else {
        out(k) = t
        i += 1
      }
      k += 1
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(
      java.util.Arrays.copyOfRange(out.asInstanceOf[Array[AnyRef]], 0, k))
  }
}

/** Count of positions p in sorted int list `a` followed within `maxGap`
  * by some position of sorted int list `b` (p < q <= p + maxGap) — the
  * phrase/proximity kernel of [[graft.sources.InvertedIndex.phrase]] and
  * `.near`. With maxGap = 1 this is exact adjacency
  * (== size(array_intersect(transform(a, p -> p+1), b)) for the sorted
  * duplicate-free lists postings carry by construction); larger gaps are
  * the search NEAR operator, each left occurrence counted once. The
  * composed formulation allocates a shifted copy of `a` plus
  * array_intersect's hash set and result array PER ROW PAIR; this is one
  * allocation-free two-pointer merge, O(|a|+|b|), inside whole-stage
  * codegen — on a join over stopword-grade postings the inner loop is
  * the entire query.
  */
case class AdjacencyCountExpr(left: Expression, right: Expression, maxGap: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(maxGap >= 1, "maxGap must be >= 1")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    AdjacencyCountExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxGap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.AdjacencyCountExpr.compute($a, $b, $maxGap)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdjacencyCountExpr =
    copy(left = l, right = r)
  override def prettyName: String = "adjacency_count"
}

object AdjacencyCountExpr {
  def compute(a: ArrayData, b: ArrayData, maxGap: Int): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na) {
      val p = a.getInt(i)
      // first b element strictly beyond p; j only advances (a is sorted)
      while (j < nb && b.getInt(j) <= p) j += 1
      if (j >= nb) return n
      if (b.getInt(j) <= p + maxGap) n += 1
      i += 1
    }
    n
  }
}
