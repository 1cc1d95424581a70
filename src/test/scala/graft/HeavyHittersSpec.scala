package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, MGSketch}

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("exact when item cardinality fits the sketch (vs groupBy counts)") {
    val got = Tables.events(spark, sf)
      .agg(GraftFunctions.heavy_hitters(col("event_type"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("event_type"), col("e.est_count").as("n"))
    val want = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("MG guarantee under eviction: heavy items survive, error <= n/(k+1)") {
    // zipf-ish skew: item i appears 2000/i times, 20 distinct, k = 4
    val data = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"item$i"))
    val n = data.length
    val k = 4
    // force real partial-state merges across 8 partitions
    val rows = spark.sparkContext.parallelize(data, 8).toDF("item")
    val est = rows.agg(GraftFunctions.heavy_hitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .as[(String, Long)].collect().toMap
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    truth.foreach { case (item, c) =>
      if (c > bound)
        assert(est.contains(item), s"$item has freq $c > n/(k+1)=$bound but was evicted")
    }
    est.foreach { case (item, e) =>
      val c = truth(item)
      assert(e <= c && e >= c - bound,
        s"$item estimate $e outside [${c - bound}, $c]")
    }
    assert(est.size <= k, "sketch must retain at most k items")
  }

  test("pure sketch: merge of any split obeys the same bounds") {
    val data = (1 to 50).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    val n = data.length
    val k = 6
    val bound = n / (k + 1)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 3, 7).foreach { parts =>
      val chunks = data.grouped(math.max(1, data.length / parts)).toSeq
      val sketches = chunks.map { ch =>
        val s = new MGSketch(k); ch.foreach(s.add); s
      }
      val merged = sketches.reduce { (a, b) => a.mergeIn(b); a }
      assert(merged.processed == n)
      merged.sorted.foreach { case (item, e) =>
        val c = truth(item)
        assert(e <= c && e >= c - bound, s"parts=$parts: $item -> $e not in [${c - bound}, $c]")
      }
      truth.foreach { case (item, c) =>
        if (c > bound) assert(merged.counts.containsKey(item), s"parts=$parts lost heavy $item")
      }
    }
  }

  test("sketch state is bounded through serialization roundtrips") {
    val s = new MGSketch(5)
    (1 to 10000).foreach(i => s.add(s"x${i % 100}"))
    val back = MGSketch.deserialize(5, s.serialize)
    assert(back.counts.size() <= 5 && back.processed == 10000)
    assert(back.sorted.toSeq == s.sorted.toSeq)
  }
}
