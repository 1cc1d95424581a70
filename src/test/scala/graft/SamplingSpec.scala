package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic hash sampling: reproducibility is the whole point, so
  * the specs pin invariance under repartitioning and split disjointness.
  */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sf)

  test("train/test split is disjoint, exhaustive, and ~the requested rate") {
    val split = Sampling.trainTestSplit(ev, col("event_id"), 0.8)
    val n = ev.count()
    val byTag = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byTag.values.sum == n, "every row gets exactly one tag")
    val trainFrac = byTag.getOrElse("train", 0L).toDouble / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac far from 0.8")
  }

  test("membership is invariant under repartitioning (seeded sample() is not)") {
    val a = Sampling.deterministicSample(ev, col("event_id"), 0.3)
      .select("event_id").as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(ev.repartition(13), col("event_id"), 0.3)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty && a.length < ev.count())
  }

  test("incremental append never disturbs existing assignments") {
    val first = Sampling.trainTestSplit(ev.filter(col("event_id") < 500), col("event_id"), 0.8)
      .select("event_id", "split").as[(Long, String)].collect().toMap
    val all = Sampling.trainTestSplit(ev, col("event_id"), 0.8)
      .select("event_id", "split").as[(Long, String)].collect().toMap
    first.foreach { case (id, tag) => assert(all(id) == tag) }
  }

  test("stratified sampling keeps full-rate strata whole and drops unlisted strata") {
    val got = Sampling.stratifiedSample(ev, col("event_id"), col("event_type"),
      Map("purchase" -> 1.0, "view" -> 0.1))
    val byType = got.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(byType.keySet == Set("purchase", "view"), "unlisted strata dropped")
    val nPurchase = ev.filter(col("event_type") === "purchase").count()
    assert(byType("purchase") == nPurchase, "rate 1.0 keeps the stratum whole")
    val nView = ev.filter(col("event_type") === "view").count()
    assert(byType("view") < nView / 2, "rate 0.1 downsamples")
  }

  test("weighted sampling: kept fraction tracks mean weight, bounds behave, monotone under re-score") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count().toDouble
    val kept = Sampling.weightedSample(docs, col("doc_id"), col("n_chars") / lit(600.0))
    val meanW = docs.select(avg(least(lit(1.0), col("n_chars") / lit(600.0))))
      .as[Double].head()
    val frac = kept.count() / n
    assert(math.abs(frac - meanW) < 0.1, s"kept $frac vs mean weight $meanW")
    // weight 0 drops everything, weight 1 (and clamped >1) keeps everything
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(0.0)).count() == 0L)
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(1.0)).count() == n.toLong)
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(7.5)).count() == n.toLong)
    // monotone: raising every weight only ADDS members
    val low = Sampling.weightedSample(docs, col("doc_id"), col("n_chars") / lit(1200.0))
      .select("doc_id").as[Long].collect().toSet
    val high = kept.select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high), "a raised weight must never evict a member")
  }

  test("sampling plans are map-only: no shuffle exchange") {
    val plan = Sampling.deterministicSample(ev, col("event_id"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("rebalanceMix downsamples toward the target proportions, never upsamples") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val targets = Map("src0" -> 0.4, "src1" -> 0.1)
    val kept = Sampling.rebalanceMix(docs, "source", col("doc_id"), targets)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val orig = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept.keySet.subsetOf(targets.keySet), "untargeted strata dropped")
    kept.foreach { case (s, n) => assert(n <= orig(s), s"$s upsampled") }
    // the binding stratum (largest n_s/t_s demand) is kept whole
    val binding = targets.minBy { case (s, t) => orig(s) / t }._1
    assert(kept(binding) == orig(binding), "binding stratum must keep all rows")
    // achieved mix leans toward the target ratio (4:1 here)
    assert(kept("src0") > kept("src1") * 2,
      s"mix not rebalanced: ${kept.mkString(",")}")
  }

  test("cluster-keyed splits: components never straddle a split or a fold") {
    val docs = (1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(docs, pairs, 0.8)
    assert(split.groupBy("cluster_id").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() == 0)
    val folds = Sampling.kFoldSplit(docs, pairs, 5)
    assert(folds.groupBy("cluster_id").agg(countDistinct(col("fold")).as("n"))
      .filter(col("n") > 1).count() == 0)
    assert(folds.count() == 20)
    val fr = folds.agg(min(col("fold")), max(col("fold"))).as[(Long, Long)].head()
    assert(fr._1 >= 0 && fr._2 <= 4)
    // connected components share their assignment transitively
    val byDoc = folds.select("doc_id", "fold").as[(Long, Long)].collect().toMap
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L))
    assert(byDoc(10L) == byDoc(11L))
  }

  test("per-group reservoir keeps exactly k rows per group, deterministically") {
    val got = Sampling.reservoirByGroup(ev, Seq("event_type"), col("event_id"), 3)
    val sizes = got.groupBy("event_type").count().as[(String, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(_._2 == 3L), sizes.mkString(","))
    // pure function of the data: identical ids after a repartition
    val again = Sampling.reservoirByGroup(
      ev.repartition(7), Seq("event_type"), col("event_id"), 3)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "sample_rank", "event_id")
        .as[(String, Int, Long)].collect().toSet
    assert(ids(got) == ids(again))
  }

  test("temperature mix: alpha=1 keeps everything, alpha=0 keeps the smallest stratum whole") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val natural = Sampling.temperatureMix(docs, "source", col("doc_id"), alpha = 1.0)
    assert(natural.count() == docs.count(), "alpha=1 must keep natural proportions whole")
    val counts = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val smallest = counts.minBy { case (s, n) => (n, s) }._1
    val flat = Sampling.temperatureMix(docs, "source", col("doc_id"), alpha = 0.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(flat(smallest) == counts(smallest),
      s"alpha=0 must keep the smallest stratum whole: $flat vs $counts")
    // larger strata flatten DOWN toward the smallest, never below it by
    // more than hash-bucket rounding (1/1000 granularity)
    flat.foreach { case (s, n) =>
      assert(n <= counts(s))
      assert(n >= (counts(smallest) * 0.9).toLong, s"$s flattened too far: $n")
    }
  }
}
