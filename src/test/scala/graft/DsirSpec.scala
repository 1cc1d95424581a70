package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.functions.PolyHash

/** DSIR importance resampling: the log-weight arithmetic is pinned
  * against an independent in-test reference implementation (plain Scala
  * maps — no Spark, no shared helper code beyond the hash constant), and
  * the selection invariants (determinism, weighted-toward-target) are
  * asserted on the real corpus.
  */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private val B = 512

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang"), col("text"))

  /** Independent reference: same definition, different code path. */
  private def referenceWeights(
      rows: Seq[(Long, String, String)]): Map[Long, (Long, Double)] = {
    val mixA = Sampling.MixA
    def bucket(term: String): Long =
      ((PolyHash.hash(term) * mixA) % PolyHash.P) % B
    def feats(text: String): Seq[Long] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val bi = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      (toks ++ bi).map(bucket)
    }
    val perDoc = rows.map { case (id, lang, text) =>
      (id, lang == "en", feats(text).groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val tc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val pc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    perDoc.foreach { case (_, isTgt, cs) =>
      cs.foreach { case (f, c) =>
        if (isTgt) tc(f) += c
        pc(f) += c
      }
    }
    val tcTot = tc.values.sum
    val pcTot = pc.values.sum
    // HALF_UP (away from zero), matching Spark/DuckDB round — NOT
    // math.round, which rounds negative halves toward +inf
    def lrq(f: Long): Long =
      BigDecimal((math.log((tc(f) + 0.5) / (tcTot + 0.5 * B)) -
        math.log((pc(f) + 0.5) / (pcTot + 0.5 * B))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    perDoc.map { case (id, _, cs) =>
      val wq = cs.map { case (f, c) => c * lrq(f) }.sum
      val n = cs.values.sum
      // exact: integer micro-nats / 1e6, no presentation rounding
      id -> (n, wq / 1e6)
    }.toMap
  }

  test("log-weights match the independent reference implementation exactly") {
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val expected = referenceWeights(rows)
    val got = Sampling.dsirLogWeights(docs, col("lang") === "en", B)
      .select(col("doc_id"), col("n_feats"), col("log_weight"))
      .as[(Long, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, n, w) =>
      val (en, ew) = expected(id)
      assert(n == en, s"doc $id n_feats $n != $en")
      assert(w == ew, s"doc $id log_weight $w != $ew")
    }
  }

  test("weights are invariant under repartitioning") {
    val a = Sampling.dsirLogWeights(docs, col("lang") === "en", B)
      .select(col("doc_id"), col("log_weight")).as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    val b = Sampling.dsirLogWeights(docs.repartition(13), col("lang") === "en", B)
      .select(col("doc_id"), col("log_weight")).as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("target documents score higher than the rest on average") {
    val byTgt = Sampling.dsirLogWeights(docs, col("lang") === "en", B)
      .groupBy(col("is_target")).agg(avg(col("log_weight")).as("w"))
      .as[(Boolean, Double)].collect().toMap
    assert(byTgt(true) > byTgt(false),
      s"target mean ${byTgt(true)} should exceed pool mean ${byTgt(false)}")
  }

  test("selection is a deterministic size-k draw biased toward the target") {
    val k = 20
    val sel = Sampling.dsirSelect(docs, col("lang") === "en", B, k)
    val rows = sel.select(col("doc_id"), col("is_target"), col("log_weight"),
        col("gumbel"), col("score"))
      .as[(Long, Boolean, Double, Double, Double)].collect()
    assert(rows.length == k)
    assert(rows.map(_._1).distinct.length == k, "no doc drawn twice")
    rows.foreach { case (_, _, w, g, s0) =>
      assert(s0 == w + g, s"score must be the raw sum: $s0 vs ${w + g}")
    }
    val again = Sampling.dsirSelect(docs.repartition(7), col("lang") === "en", B, k)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == rows.map(_._1).toSet, "draw must be reproducible")
    // weighted draw: the target share among selected docs must exceed the
    // target's base rate (en is a minority of the corpus; weights favor it)
    val baseRate = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    val selRate = rows.count(_._2).toDouble / k
    assert(selRate > baseRate,
      s"selected target share $selRate should exceed base rate $baseRate")
  }

  test("empty corpus yields an empty weight table, not a crash") {
    val empty = docs.filter(col("doc_id") < 0)
    assert(Sampling.dsirLogWeights(empty, col("lang") === "en", B).count() == 0)
  }

  test("plan shape: the model joins broadcast; no Expand; counts combine map-side") {
    val plan = Sampling.dsirLogWeights(docs, col("lang") === "en", B)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "B-row model must broadcast to the scoring join")
    assert(!plan.contains("Expand"),
      "no distinct-rewrite Expand anywhere in the weight plan")
    // the (doc, feature) count is a two-phase hash aggregate: a partial
    // before the exchange (map-side combine) so the shuffle carries
    // distinct (doc, f) pairs, not token occurrences
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("apply(delta, fitted model) equals the full weight table restricted to the delta") {
    val model = Sampling.dsirModel(docs, col("lang") === "en", B)
    assert(model.count() <= B, "model must be at most B rows")
    val applied = Sampling.dsirApply(
        docs.filter(col("doc_id") % 50 === 0), model, B)
      .select(col("doc_id"), col("n_feats"), col("log_weight"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val full = Sampling.dsirLogWeights(docs, col("lang") === "en", B)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("n_feats"), col("log_weight"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(applied.nonEmpty && applied == full)
  }
}
