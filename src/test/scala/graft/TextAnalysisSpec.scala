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

  test("BPE merges on a hand-computed corpus: ties, runs, and rewrites") {
    val docs = Seq(
      (1L, "x y x y z"),
      (2L, "x y q"),
      (3L, "a a a a")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergeRounds(docs, rounds = 3)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      // (a,a) ties (x,y) at 3, wins lexicographically; the aaaa run
      // merges leftmost non-overlapping into two "a a" tokens
      (1, "a", "a", 3L, 10L),
      (2, "x", "y", 3L, 7L),
      // all pairs tie at 1; ("a a","a a") is lexicographically least
      (3, "a a", "a a", 1L, 6L)))
  }

  test("bpe_merge_pair kernel: greedy scan == leftmost non-overlapping reference") {
    import graft.functions.GraftFunctions.bpeMergePair
    def ref(toks: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += a + " " + b; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c")
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("a"), Seq("a", "a"), Seq("a", "a", "a"),
        Seq("a", "a", "a", "a"), Seq("b", "a", "a", "a", "c")) ++
        (1 to 60).map(_ => Vector.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(3))).toSeq)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("b", "c"), ("z", "z"))) {
      val got = df.select(col("id"), bpeMergePair(col("toks"), a, b).as("m"))
        .as[(Long, Seq[String])].collect().toMap
      cases.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t, a, b), s"case $i pair ($a,$b)")
      }
    }
    // round 2 shape: a previously-merged (space-joined) token as pair side
    val chained = Seq((0L, Seq("a b", "c", "a b", "a b"))).toDF("id", "toks")
      .select(bpeMergePair(col("toks"), "a b", "a b").as("m")).as[Seq[String]].collect()(0)
    assert(chained == Seq("a b", "c", "a b a b"))
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

  test("chunks: sliding windows with overlap on a hand-computed doc") {
    val docs = Seq((1L, (0 until 10).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunks(docs, chunkSize = 4, stride = 3)
      .select("chunk_idx", "chunk_start", "chunk_len")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0, 4), (1L, 3, 4), (2L, 6, 4), (3L, 9, 1)))
  }

  test("chunks: hash matches poly_hash of the joined window; full coverage") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).limit(50)
    val chunks = TextAnalysis.chunks(docs, 32, 24)
    // last chunk ends exactly at n_tok => every token lands in >= 1 chunk
    val cover = chunks.groupBy("doc_id")
      .agg(max(col("chunk_start") + col("chunk_len")).as("covered"))
      .join(docs.select(col("doc_id"),
        size(graft.functions.GraftFunctions.tokens(col("text"))).as("n_tok")), "doc_id")
      .where(col("covered") =!= col("n_tok")).count()
    assert(cover == 0)
    // spot-check one hash against the scalar implementation
    val one = docs.limit(1).select(col("doc_id"), col("text")).as[(Long, String)].head()
    val toks = one._2.split("\\s+").filter(_.nonEmpty)
    val expect = graft.functions.PolyHash.hash(toks.slice(0, 32).mkString(" "))
    val gotHash = chunks.where(col("doc_id") === one._1 && col("chunk_idx") === 0)
      .select("chunk_hash").as[Long].head()
    assert(gotHash == expect)
  }

  test("chunks plan is map-only (no Exchange before the caller's sort)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = TextAnalysis.chunks(docs, 32, 24).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("piiScrub: redacts and counts every pattern, all occurrences") {
    val docs = Seq(
      (1L, "mail a@b.com or b@c.org, call 555-123-4567, host 10.0.0.1 end"),
      (2L, "clean text")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs)
      .select("doc_id", "n_email", "n_phone", "n_ip", "clean_text")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0)._2 == 2 && got(0)._3 == 1 && got(0)._4 == 1)
    assert(got(0)._5 ==
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP> end")
    assert(got(1) == ((2L, 0, 0, 0, "clean text")))
  }

  test("piiScrub: email stage consumes dotted hosts before the IP stage") {
    val got = TextAnalysis.piiScrub(Seq((1L, "v1.2.3.4@host.com here"))
        .toDF("doc_id", "text"))
      .select("n_email", "n_ip", "clean_text").as[(Int, Int, String)].head()
    assert(got == ((1, 0, "<EMAIL> here")))
  }

  test("vocabOov: top-k vocab with ties by term; per-doc OOV counts") {
    val docs = Seq(
      (1L, "a a b c"),   // a:2 within doc
      (2L, "b b d")      // corpus tf: a=2 b=3 c=1 d=1
    ).toDF("doc_id", "text")
    // vocabSize=2 -> vocab {b(3), a(2)}; c and d are OOV
    val got = TextAnalysis.vocabOov(docs, 2)
      .select("doc_id", "n_tok", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 3L, 1L, 0.3333)))
  }

  test("vocabOov plan: vocab via TakeOrdered (no global sort), broadcast join-back") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = TextAnalysis.vocabOov(docs, 100).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab selection must be a distributed top-k, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$plan")
  }

  test("repetition: high for looped text, zero for all-distinct text") {
    val docs = Seq(
      (1L, "ab ab ab ab ab ab ab ab"),  // 3 distinct 5-grams, 1 distinct token
      (2L, "pqrst uvwxy")               // all 5-grams and tokens distinct
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, 5)
      .select("doc_id", "gram_rep_ratio", "tok_rep_ratio")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(got(0)._2 > 0.8 && got(0)._3 == math.rint((1.0 - 1.0 / 8) * 10000) / 10000)
    assert(got(1)._2 == 0.0 && got(1)._3 == 0.0)
  }

  test("cooccurrencePmi: zip_with pair generation equals the positions self-join") {
    import graft.functions.GraftFunctions
    val docs = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), col("text"))
    val got = TextAnalysis.cooccurrencePmi(docs, window = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    // reference: explicit positions self-join (the formulation the map-only
    // zip_with path exists to avoid)
    val terms = docs.select(col("doc_id"),
      posexplode(GraftFunctions.tokens(lower(col("text")))))
    val n = terms.count()
    val uni = terms.groupBy(col("col").as("t")).agg(count(lit(1)).as("c"))
    val expected = terms.as("a").join(terms.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 2)
      .groupBy(col("a.col").as("term_a"), col("b.col").as("term_b"))
      .agg(count(lit(1)).as("c_ab")).filter(col("c_ab") >= 2)
      .join(uni.select(col("t").as("term_a"), col("c").as("c_a")), Seq("term_a"))
      .join(uni.select(col("t").as("term_b"), col("c").as("c_b")), Seq("term_b"))
      .select(col("term_a"), col("term_b"), col("c_ab"),
        round(log((col("c_ab") * lit(n)).cast("double") /
          (col("c_a") * col("c_b"))), 4).as("pmi"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("cooccurrencePmi plan: pair generation is map-only (no join before the pair count)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = TextAnalysis.cooccurrencePmi(docs, window = 2)
      .queryExecution.optimizedPlan
    // the only joins in the plan are the two vocab-sized PMI join-backs;
    // pair generation itself must contribute none (zip_with, not self-join)
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 2, plan.toString.take(2000))
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
