package graft

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, PolyHash}
import graft.sources.BookmarkStore

/** ScalaCheck properties for the engine's pure kernels (no Spark session —
  * these run per-generated-case).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: org.scalacheck.Prop): Unit = test(name) {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  check("PolyHash stays in [0, P) and is deterministic") {
    forAll { (s: String) =>
      val h = PolyHash.hash(s)
      h >= 0 && h < PolyHash.P && h == PolyHash.hash(s)
    }
  }

  check("ShingleHashes: distinct, and at most len-n+1 shingles") {
    forAll(Gen.alphaNumStr) { s =>
      val arr = graft.functions.ShingleHashesExpr.compute(s, 3).toLongArray()
      arr.length == arr.distinct.length &&
        arr.length <= math.max(s.length - 2, 0)
    }
  }

  check("int8 score identity: the stats formula IS the reconstructed cosine") {
    // Similarity.int8TopK scores pairs from four per-vector scalars and one
    // integer dot product; the property pins the algebra against the naive
    // path (reconstruct both vectors, take their cosine) on random vectors.
    val genVec = Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 250.0f))
    forAll(genVec, genVec) { (xs, ys) =>
      def stats(v: Seq[Float]): (Double, Double, Seq[Long]) = {
        val lo = v.min.toDouble
        val scale = (v.max.toDouble - lo) / 255.0
        val codes =
          if (scale == 0) v.map(_ => 0L)
          else v.map(x => math.round((x.toDouble - lo) / scale))
        (lo, scale, codes)
      }
      val (lox, sx, cx) = stats(xs)
      val (loy, sy, cy) = stats(ys)
      val d = xs.length.toDouble
      val dotc = cx.zip(cy).map { case (a, b) => a * b }.sum.toDouble
      val num = sx * sy * dotc + sx * loy * cx.sum + sy * lox * cy.sum + d * lox * loy
      def nrm(s: Double, lo: Double, c: Seq[Long]): Double =
        math.sqrt(s * s * c.map(v => (v * v).toDouble).sum + 2.0 * s * lo * c.sum + d * lo * lo)
      val denom = nrm(sx, lox, cx) * nrm(sy, loy, cy)
      val approx = if (denom == 0) 0.0 else num / denom
      val rx = cx.map(c => c * sx + lox)
      val ry = cy.map(c => c * sy + loy)
      val dot = rx.zip(ry).map { case (a, b) => a * b }.sum
      val nn = math.sqrt(rx.map(v => v * v).sum) * math.sqrt(ry.map(v => v * v).sum)
      val direct = if (nn == 0) 0.0 else dot / nn
      math.abs(approx - direct) <= 1e-9
    }
  }

  check("MinHash signature is permutation-invariant in its input set") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, PolyHash.P - 1))) { hs =>
      val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray)
      val b = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.reverse.toArray)
      val sa = graft.functions.MinHashSignatureExpr.compute(a, 8).toLongArray().toSeq
      val sb = graft.functions.MinHashSignatureExpr.compute(b, 8).toLongArray().toSeq
      sa == sb
    }
  }

  check("adding elements can only lower each MinHash signature slot") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, PolyHash.P - 1)),
      Gen.nonEmptyListOf(Gen.chooseNum(0L, PolyHash.P - 1))) { (hs, extra) =>
      def sig(xs: List[Long]) = graft.functions.MinHashSignatureExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray), 8).toLongArray()
      sig(hs ++ extra).zip(sig(hs)).forall { case (sup, sub) => sup <= sub }
    }
  }

  check("bookmark store: last commit wins, slots are independent") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L))) { commits =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      val store = new BookmarkStore(dir)
      commits.foreach(store.commit("t", "ctx", _))
      store.commit("t", "other", -1L)
      val ok = store.get("t", "ctx").contains(commits.last) &&
        store.get("t", "other").contains(-1L) &&
        store.get("t2", "ctx").isEmpty
      store.clear()
      ok
    }
  }

  check("simhash of identical multisets is equal; bits bounded") {
    forAll(Gen.listOf(Gen.chooseNum(0L, PolyHash.P - 1))) { hs =>
      val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray)
      val s = graft.functions.SimHashExpr.compute(a, 16)
      s >= 0 && s < (1L << 16) &&
        s == graft.functions.SimHashExpr.compute(a, 16)
    }
  }

  check("SeqSource.valOf lands in [0, 1) and is deterministic") {
    forAll(Gen.chooseNum(0L, 10000000L)) { id =>
      val v = graft.sources.SeqSource.valOf(id)
      v >= 0.0 && v < 1.0 && v == graft.sources.SeqSource.valOf(id)
    }
  }

  check("minhash coefficients: stable prefix property") {
    forAll(Gen.chooseNum(1, 32)) { k =>
      GraftFunctions.minhashCoefficients(32).take(k) ==
        GraftFunctions.minhashCoefficients(k)
    }
  }

  // adversarial text: words, digits, punctuation, marker words, and every
  // java-regex \s whitespace char, concatenated in random order
  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf(".", ",", ";", ":", "!", "?", "@", "-"),
    Gen.oneOf("the", "und", "les", "que", "de5"),
    Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  "))).map(_.mkString)

  private def refTokens(s: String): Seq[String] =
    s.split("\\s+").toSeq.filter(_.nonEmpty)

  check("token_ngrams equals the split-based reference on adversarial text") {
    forAll(textGen, Gen.chooseNum(1, 4)) { (s, n) =>
      val got = graft.functions.TokenNgramsExpr.compute(s, n)
        .toArray[Object](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val toks = refTokens(s)
      val want = if (toks.size < n) Nil
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      got == want
    }
  }

  check("TextStatsExpr counts equal the regex-based reference formulations") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(textGen) { s =>
      val row = graft.functions.TextStatsExpr.compute(
        UTF8String.fromString(s), UTF8String.fromString(s.toLowerCase))
      val low = s.toLowerCase
      val markers = graft.functions.TextStatsExpr.langMarkers
      val ltoks = refTokens(low)
      val nTokens = refTokens(s).size
      val punct = s.count(".,;:!?".contains(_))
      val bpe = s.split("(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])")
        .count(t => t.nonEmpty && t != " ")
      val stop = ltoks.count(markers.flatMap(_._2).toSet)
      val langCounts = markers.map { case (_, ms) => ltoks.count(ms.toSet) }
      row.getInt(0) == nTokens &&
        row.getInt(1) == punct &&
        row.getInt(2) == stop &&
        langCounts.zipWithIndex.forall { case (c, i) => row.getInt(3 + i) == c } &&
        row.getInt(3 + markers.size) == bpe &&
        row.getLong(4 + markers.size) == PolyHash.hash(s)
    }
  }

  // --- winnowing guarantee (Schleimer et al. 2003, theorem 1) -----------
  // Any two token sequences sharing a contiguous run of >= spanLen +
  // window - 1 tokens MUST share at least one winnow fingerprint: the run
  // contains >= `window` consecutive spans, that full window occurs in
  // both sequences, and its minimum — identical on both sides — is
  // selected on both sides. This is the property that makes winnowPairs a
  // sound (no-false-negative) near-dup CANDIDATE stage above the length
  // threshold; the df prune is the only stage allowed to drop a true pair.

  /** Winnow fingerprint set per the operator's definition: min over each
    * full window of `w` consecutive span hashes (spans via the production
    * kernel `SpanHashesExpr.compute`).
    */
  private def winnowFps(tokenHashes: Seq[Long], spanLen: Int, w: Int): Set[Long] = {
    val spans = graft.functions.SpanHashesExpr.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(tokenHashes.toArray),
      spanLen).toLongArray()
    (0 to spans.length - w).map(i => spans.slice(i, i + w).min).toSet
  }

  private val tokGen = Gen.chooseNum(0L, PolyHash.P - 1)

  check("winnowing guarantee: a shared run of spanLen+window-1 tokens shares a fingerprint") {
    val L = 4
    val W = 3
    forAll(
      Gen.nonEmptyListOf(tokGen), // shared run, padded to L+W-1 below
      Gen.listOf(tokGen), Gen.listOf(tokGen), // doc A prefix/suffix
      Gen.listOf(tokGen), Gen.listOf(tokGen)  // doc B prefix/suffix
    ) { (run0, ap, as, bp, bs) =>
      val run = (run0 ++ List.fill(L + W - 1)(7L)).take(math.max(run0.size, L + W - 1))
      val a = ap ++ run ++ as
      val b = bp ++ run ++ bs
      (winnowFps(a, L, W) intersect winnowFps(b, L, W)).nonEmpty
    }
  }

  check("winnow fingerprints are a subset of span hashes, ~bounded by span count") {
    val L = 4
    val W = 3
    forAll(Gen.listOfN(40, tokGen)) { toks =>
      val spans = graft.functions.SpanHashesExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(toks.toArray),
        L).toLongArray().toSet
      val fps = winnowFps(toks, L, W)
      fps.subsetOf(spans) && fps.size <= math.max(spans.size, 1)
    }
  }
}
