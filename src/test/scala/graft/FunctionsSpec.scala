package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, PolyHash}
import graft.functions.GraftFunctions._

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("PolyHash matches the reference arithmetic (cross-checked vs DuckDB)") {
    // SELECT list_reduce(list_prepend(0, [ord(c) for c in 'hello']), (h,c)->(h*31+c)%2147483647) == 99162322
    assert(PolyHash.hash("hello") == 99162322L)
    assert(PolyHash.hash("") == 0L)
  }

  test("poly_hash column expression agrees with the Scala function (codegen path)") {
    val df = Seq("hello", "", "spark graft", "a").toDF("s")
      .select(col("s"), poly_hash(col("s")).as("h"))
    df.collect().foreach { case Row(s: String, h: Long) =>
      assert(h == PolyHash.hash(s), s"for '$s'")
    }
  }

  test("shingles: too-short strings give empty set, not a descending sequence") {
    val got = Seq("ab", "abc", "abcd").toDF("s")
      .select(shingles(col("s"), 3).as("g")).as[Seq[String]].collect()
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq("abc"))
    assert(got(2) == Seq("abc", "bcd"))
  }

  test("shingleHashes are distinct") {
    val got = Seq("aaaa").toDF("s") // shingles aaa, aaa -> one distinct
      .select(shingleHashes(col("s"), 3).as("g")).as[Seq[Long]].collect()
    assert(got(0).length == 1)
  }

  test("minhash signature: identical sets give identical signatures, length k") {
    val df = Seq("the quick brown fox", "the quick brown fox", "other text entirely")
      .toDF("s").select(minhashSignature(shingleHashes(col("s"), 3), 8).as("sig"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows(0).length == 8)
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("simhash: identical token multisets collide; hamming distance is popcount") {
    val df = Seq(("a b c a", "a b c a"), ("a b c a", "x y z w")).toDF("s1", "s2")
      .select(
        simhash(transform(tokens(col("s1")), t => poly_hash(t)), 16).as("h1"),
        simhash(transform(tokens(col("s2")), t => poly_hash(t)), 16).as("h2"))
      .select(hammingDistance(col("h1"), col("h2")).as("d")).as[Int].collect()
    assert(df(0) == 0)
    assert(df(1) > 0)
  }

  test("cosine similarity: identity 1, orthogonal 0, zero-norm guarded to 0") {
    val rows = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(0f, 0f), Seq(1f, 1f)))
      .toDF("a", "b")
      .select(round(cosineSimilarity(col("a"), col("b")), 6).as("c")).as[Double].collect()
    assert(rows(0) == 1.0)
    assert(rows(1) == 0.0)
    assert(rows(2) == 0.0)
  }

  test("dotProduct/l2Norm basic algebra") {
    val rows = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("d"), l2Norm(col("a")).as("n"))
      .as[(Double, Double)].collect()
    assert(rows(0)._1 == 32.0)
    assert(math.abs(rows(0)._2 - math.sqrt(14.0)) < 1e-12)
  }

  test("codegen'd shingle/minhash/simhash equal the composed HOF formulations") {
    val docs = Tables.documents(spark, sf).limit(100)
    val mismatch = docs.select(
      shingleHashes(col("text"), 3).as("fast_sh"),
      shingleHashesComposed(col("text"), 3).as("ref_sh"),
      minhashSignature(shingleHashes(col("text"), 3), 16).as("fast_sig"),
      minhashSignatureComposed(shingleHashesComposed(col("text"), 3), 16).as("ref_sig"),
      simhashOf(col("text"), 16).as("fast_sim"),
      simhash(transform(tokens(col("text")), t => poly_hash(t)), 16).as("ref_sim"),
      tokenHashes(col("text")).as("fast_tok"),
      transform(tokens(col("text")), t => poly_hash(t)).as("ref_tok"))
      .filter(col("fast_sh") =!= col("ref_sh") || col("fast_sig") =!= col("ref_sig") ||
        col("fast_sim") =!= col("ref_sim") || col("fast_tok") =!= col("ref_tok"))
      .count()
    assert(mismatch == 0)
  }

  test("codegen'd span_hashes equals the composed formulation; edge cases") {
    val docs = Tables.documents(spark, sf).limit(100)
    for (l <- Seq(2, 5, 8)) {
      val mismatch = docs.select(
        spanHashes(tokenHashes(col("text")), l).as("fast"),
        spanHashesComposed(tokenHashes(col("text")), l).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(mismatch == 0, s"spanLen=$l")
    }
    // fewer tokens than the span -> empty; exactly the span -> one hash,
    // equal to the full-array poly fold
    val rows = Seq("a b", "a b c").toDF("text")
      .select(spanHashes(tokenHashes(col("text")), 3).as("g"))
      .as[Seq[Long]].collect()
    assert(rows(0).isEmpty && rows(1).size == 1)
  }

  test("codegen'd token_ngrams equals the composed formulation; edge cases") {
    val docs = Tables.documents(spark, sf).limit(100)
    for (n <- Seq(1, 2, 3)) {
      val mismatch = docs.select(
        tokenNgrams(lower(col("text")), n).as("fast"),
        tokenNgramsComposed(lower(col("text")), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(mismatch == 0, s"n=$n")
    }
    val edge = Seq("", "  ", "one", "one two", " a  b\tc ").toDF("text")
    val rows = edge.select(tokenNgrams(col("text"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(rows.toSeq == Seq(Nil, Nil, Nil, Seq("one two"), Seq("a b", "b c")))
  }

  test("codegen'd shingle/minhash edge cases: short and empty strings") {
    val rows = Seq("", "ab", "abc").toDF("s")
      .select(shingleHashes(col("s"), 3).as("g"),
        minhashSignature(shingleHashes(col("s"), 3), 4).as("sig"))
      .as[(Seq[Long], Seq[Option[Long]])].collect()
    assert(rows(0)._1.isEmpty && rows(0)._2 == Seq(None, None, None, None))
    assert(rows(1)._1.isEmpty)
    assert(rows(2)._1.length == 1 && rows(2)._2.forall(_.isDefined))
  }

  test("codegen'd cosine equals the composed HOF formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id")).limit(500)
    val hofDenom = l2Norm(col("a.embedding")) * l2Norm(col("b.embedding"))
    val hof = when(hofDenom === 0.0, lit(0.0))
      .otherwise(dotProduct(col("a.embedding"), col("b.embedding")) / hofDenom)
    val mismatches = pairs
      .select(cosineSimilarity(col("a.embedding"), col("b.embedding")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("norm-hoisted cosine equals the fused expression bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding"), l2_fast(col("embedding")).as("nrm"))
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id")).limit(1000)
    val hoisted = when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
      .otherwise(dot_fast(col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")))
    val mismatches = pairs
      .select(hoisted.as("h"), cosineSimilarity(col("a.embedding"), col("b.embedding")).as("f"))
      .filter(col("h") =!= col("f")).count()
    assert(mismatches == 0)
  }

  test("minhash coefficients are deterministic and in range") {
    val c1 = GraftFunctions.minhashCoefficients(16)
    val c2 = GraftFunctions.minhashCoefficients(16)
    assert(c1 == c2)
    assert(c1.forall { case (a, b) => a >= 1 && a < PolyHash.P && b >= 0 && b < PolyHash.P })
    assert(c1.distinct.length == 16)
  }

  test("TopKImperative equals the typed TopKAggregator bit-for-bit (incl. ties and short groups)") {
    // deterministic pseudo-random values with planted ties; group "g3" has
    // fewer rows than k
    val rows = (0L until 500L).map { i =>
      val v = ((i * 2654435761L) % 97L).toDouble / 7.0
      (s"g${i % 3}", i, v)
    } ++ Seq(("g3", 9001L, 1.0), ("g3", 9000L, 1.0))
    val df = rows.toDF("event_type", "event_id", "value")

    val imperative = df.groupBy($"event_type")
      .agg(top_k($"event_id", $"value", 5).as("topk"))
      .select($"event_type", posexplode($"topk"))
      .select($"event_type", ($"pos" + 1).as("rank"), $"col.id".as("event_id"),
        $"col.value".as("value"))
      .as[(String, Long, Long, Double)].collect().sorted

    val typed = df.as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(e => (e._2, e._3))
      .agg(graft.functions.TopKAggregator(5).toColumn.name("topk"))
      .flatMap { case (t, tops) =>
        tops.zipWithIndex.map { case ((v, id), r) => (t, (r + 1).toLong, id, v) }
      }.collect().sorted

    assert(imperative.toSeq == typed.toSeq)
    // ties broken by id asc: g3's two value-1.0 rows rank 9000 before 9001
    val g3 = imperative.filter(_._1 == "g3")
    assert(g3.map(_._3).toSeq == Seq(9000L, 9001L))
  }

  test("TopKHeap: bounded size, eviction order, serialization round-trip") {
    val h = new graft.functions.TopKHeap(3)
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (4.0, 4L), (2.0, 5L)).foreach {
      case (v, id) => h.insert(v, id)
    }
    assert(h.size == 3)
    assert(h.sorted.toSeq == Seq((5.0, 1L), (4.0, 4L), (3.0, 3L)))
    val rt = graft.functions.TopKHeap.deserialize(3, h.serialize)
    assert(rt.sorted.toSeq == h.sorted.toSeq)
    // merging two heaps keeps the global top-k
    val h2 = new graft.functions.TopKHeap(3)
    Seq((10.0, 6L), (0.5, 7L)).foreach { case (v, id) => h2.insert(v, id) }
    h2.drainInto(h)
    assert(h.sorted.toSeq == Seq((10.0, 6L), (5.0, 1L), (4.0, 4L)))
  }

  test("approx sketches are within tolerance of exact answers") {
    // approx_count_distinct default rsd = 5%; allow 3x that margin.
    // approx_percentile with accuracy A has rank error <= 1/A — assert the
    // approx median lands between the exact 0.45 and 0.55 quantiles.
    val df = Tables.events(spark, sf)
    val got = df.groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id").as("approx_users"),
        countDistinct($"user_id").as("exact_users"),
        expr("approx_percentile(value, 0.5)").as("approx_median"),
        expr("percentile(value, 0.45)").as("lo"),
        expr("percentile(value, 0.55)").as("hi"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"approx_count_distinct off by >15%: $approx vs $exact")
      val med = r.getDouble(3)
      assert(med >= r.getDouble(4) && med <= r.getDouble(5),
        s"approx median $med outside exact [0.45, 0.55] quantile band")
    }
  }

  test("codegen'd adjacency_count equals the composed formulation; edge cases") {
    // real position lists: per-term sorted 1-based positions from documents
    val pos = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), posexplode(tokens(lower(col("text")))))
      .groupBy(col("doc_id"), col("col").as("term"))
      .agg(sort_array(collect_list((col("pos") + 1).cast("int"))).as("ps"))
    val pairs = pos.as("a").join(pos.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
    val mismatch = pairs.select(
        GraftFunctions.adjacencyCount(col("a.ps"), col("b.ps")).as("fast"),
        size(array_intersect(transform(col("a.ps"), p => p + 1), col("b.ps")))
          .cast("int").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatch == 0)
    // edges: empty lists, no matches, runs of adjacent positions
    val rows = Seq(
      (Seq(1, 2, 3), Seq(2, 3, 4), 3), // every p+1 present
      (Seq(1, 5, 9), Seq(3, 7, 11), 0), // disjoint shifted
      (Seq.empty[Int], Seq(1, 2), 0),
      (Seq(1, 2), Seq.empty[Int], 0),
      (Seq(4), Seq(5), 1))
      .toDF("a", "b", "expect")
      .select(GraftFunctions.adjacencyCount(col("a"), col("b")).as("got"),
        col("expect"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // SQL registration round-trips through GraftExtensions
    assert(spark.sql(
      "SELECT adjacency_count(array(1, 2), array(2, 9))").head().getInt(0) === 1)
    // proximity (maxGap > 1): each left occurrence counted at most once
    val prox = Seq(
      (Seq(1, 10), Seq(3, 12), 3, 2), // both within gap 3
      (Seq(1, 10), Seq(3, 12), 2, 2),
      (Seq(1, 10), Seq(5, 14), 3, 0), // both beyond gap 3
      (Seq(1), Seq(2, 3, 4), 5, 1), // several matches, one left occurrence
      (Seq(1, 2, 3), Seq(4), 3, 3)) // one right serves several lefts
      .toDF("a", "b", "gap", "expect")
    Seq(2, 3, 5).foreach { g =>
      prox.filter(col("gap") === g)
        .select(GraftFunctions.adjacencyCount(col("a"), col("b"), g).as("got"),
          col("expect")).collect()
        .foreach(r => assert(r.getInt(0) === r.getInt(1), s"gap $g"))
    }
    assert(spark.sql(
      "SELECT adjacency_count(array(1), array(4), 3)").head().getInt(0) === 1)
  }
}
