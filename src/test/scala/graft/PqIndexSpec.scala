package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.PqIndex

/** The persisted PQ index must answer exactly like the train-per-run
  * path with the same training corpus, keep stored codes frozen across
  * appends, and never expose an uncommitted generation.
  */
class PqIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sf)
  private def oldVecs = corpus.filter(col("vec_id") % 50 =!= 0)
  private def delta = corpus.filter(col("vec_id") % 50 === 0)
  private def queries = corpus.filter(col("vec_id") < 8)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted

  test("full-corpus bootstrap answers identically to the train-per-run path") {
    val idx = new PqIndex(spark, TempDirs.create("pq-idx-spec"), m = 8, codes = 16)
    idx.bootstrap(corpus)
    val got = rows(idx.topK(corpus, queries, 5, shortlist = 20))
    val expected = rows(Similarity.pqTopK(corpus, queries, 5, shortlist = 20))
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("append encodes only the delta; frozen codebooks keep old codes byte-stable") {
    val idx = new PqIndex(spark, TempDirs.create("pq-idx-spec2"), m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    assert(idx.committedGen === 0L)
    val before = idx.codesDf.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    idx.append(delta)
    assert(idx.committedGen === 1L)
    val after = idx.codesDf.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    // every vector encoded exactly once, old rows unchanged
    assert(after.map(_._1).distinct.length === after.length)
    assert(after.length === corpus.count())
    assert(after.filter { case (id, _) => id % 50 != 0 } === before)
    // frozen-codebook purity: the delta's stored codes equal a fresh
    // encode of the delta under the same books (pure function of the
    // vector — the invariant that makes appends delta-sized)
    val pure = Similarity.pqEncode(delta,
        Similarity.pqTrain(oldVecs, 8, 16, 2), 8, 16)
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    assert(after.filter { case (id, _) => id % 50 == 0 } === pure)
  }

  test("appendBatch is exactly-once under redelivery and equals the batch append") {
    val idx = new PqIndex(spark, TempDirs.create("pq-idx-batch"), m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    assert(idx.committedGen === 1L)
    val once = idx.codesDf.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    idx.appendBatch(delta, batchId = 0L) // redelivery must no-op
    assert(idx.committedGen === 1L)
    assert(idx.codesDf.count() === once.length)
    val plain = new PqIndex(spark, TempDirs.create("pq-idx-batch2"), m = 8, codes = 16)
    plain.bootstrap(oldVecs)
    plain.append(delta)
    assert(plain.codesDf.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1) === once)
  }

  test("persisted-path recall tripwire: topK clears 0.9 at the stamped operating point through an appendBatch'd store") {
    // The flat-PQ half of r12 verdict #1 (see IvfPqIndexSpec for the
    // composition): recall of the STORE's ADC scan — frozen codebooks +
    // stored codes, delta ingested via appendBatch — at the declared
    // operating point (m=8, codes=256, iters=2, shortlist=200), with the
    // fit params read back from the StoreParams stamp.
    val idx = new PqIndex(spark, TempDirs.create("pq-recall"), m = 8, codes = 256)
    idx.bootstrap(oldVecs)
    idx.appendBatch(delta, batchId = 0L)
    assert(idx.fittedParams === Map("m" -> 8L, "codes" -> 256L),
      s"store was fit at ${idx.fittedParams}, not the declared r12 point")
    val k = 5
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = sets(Similarity.bruteForceTopK(corpus, queries, k))
    val ann = sets(idx.topK(corpus, queries, k, shortlist = 200))
    val recall = exact.map { case (q, ex) =>
      ann.getOrElse(q, Set.empty[Long]).count(ex).toDouble / ex.size
    }.sum / exact.size
    info(f"PQ store recall@$k = $recall%.2f")
    assert(recall >= 0.9,
      f"persisted PQ recall@$k degraded to $recall%.2f at the stamped point")
  }

  test("an uncommitted generation directory is invisible to readers") {
    val dir = TempDirs.create("pq-idx-spec3")
    val idx = new PqIndex(spark, dir, m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    val committed = idx.codesDf.count()
    // simulate a crash mid-append: gen-1 parquet exists, watermark doesn't
    Seq((999999L, Seq(0, 0, 0, 0, 0, 0, 0, 0))).toDF("vec_id", "codes")
      .write.mode("overwrite").parquet(s"$dir/gen-1")
    assert(idx.committedGen === 0L)
    assert(idx.codesDf.count() === committed)
    idx.append(delta)
    assert(idx.committedGen === 1L)
    assert(idx.codesDf.count() === corpus.count())
    assert(idx.codesDf.filter(col("vec_id") === 999999L).count() === 0L)
  }

  test("bootstrap is idempotent; append before bootstrap refuses") {
    val idx = new PqIndex(spark, TempDirs.create("pq-idx-spec4"), m = 8, codes = 16)
    intercept[IllegalArgumentException] { idx.append(delta) }
    idx.bootstrap(oldVecs)
    val n = idx.codesDf.count()
    idx.bootstrap(corpus) // second bootstrap must be a no-op
    assert(idx.committedGen === 0L)
    assert(idx.codesDf.count() === n)
  }

  test("sample-bounded training: trainOn bounds the Lloyd pass, encoding covers all") {
    // production trains codebooks on a sample; the index must equal
    // train-on-sample + encode-everything done by hand
    val sample = corpus.filter(col("vec_id") % 3 === 0)
    val idx = new PqIndex(spark, TempDirs.create("pq-idx-spec5"), m = 8, codes = 16)
    idx.bootstrap(corpus, trainOn = Some(sample))
    val books = Similarity.pqTrain(sample, 8, 16, 2)
    val expected = Similarity.pqEncode(corpus, books, 8, 16)
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
    assert(idx.codesDf.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1) === expected)
  }

  test("probe plan broadcasts the query side: stored codes never shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val idx = new PqIndex(spark, TempDirs.create("pq-idx-spec6"), m = 8, codes = 16)
    idx.bootstrap(corpus)
    def collectRec[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect {
        case a: AdaptiveSparkPlanExec => collectRec(a.executedPlan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    val df = idx.topK(corpus, queries, 5, shortlist = 20)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    // the ADC scan consumes stored codes via a broadcast of the tiny
    // query-table side (non-equi self-exclusion => nested-loop broadcast)
    val bnl = collectRec(df.queryExecution.executedPlan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, df.queryExecution.executedPlan.toString.take(3000))
  }

  test("compact folds generations into a vec_id-clustered base; probes and later appends unchanged") {
    val d0 = corpus.filter(col("vec_id") % 100 === 0)
    val d50 = corpus.filter(col("vec_id") % 100 === 50)
    val idx = new PqIndex(spark, TempDirs.create("pq-cmp"), m = 8, codes = 16)
    idx.bootstrap(oldVecs)
    idx.appendBatch(d0, batchId = 0L)
    assert(idx.fragmentCount === 2L)
    assert(idx.compactionDue(1) && !idx.compactionDue(2))
    idx.compact()
    assert(idx.compactedThrough === 1L && idx.committedGen === 1L)
    assert(idx.fragmentCount === 1L && !idx.compactionDue(1))
    idx.append(d50) // gen 2 on top of base-1
    val ref = new PqIndex(spark, TempDirs.create("pq-cmp-ref"), m = 8, codes = 16)
    ref.bootstrap(oldVecs)
    ref.append(delta)
    val expected = rows(ref.topK(corpus, queries, 5, shortlist = 20))
    assert(expected.nonEmpty)
    assert(rows(idx.topK(corpus, queries, 5, shortlist = 20)) === expected)
    idx.compact(retireSuperseded = true)
    assert(idx.compactedThrough === 2L)
    assert(rows(idx.topK(corpus, queries, 5, shortlist = 20)) === expected)
    assert(idx.codesDf.inputFiles.forall(_.contains("base-2")))
  }
}
