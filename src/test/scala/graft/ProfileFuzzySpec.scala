package graft

import org.apache.spark.sql.functions._
import graft.operators.{FuzzyMatch, Profile, TextAnalysis}

class ProfileFuzzySpec extends SparkSuite {
  import spark.implicits._

  test("bigram LM: counts and conditionals, normalizer over ALL pairs of a context") {
    val docs = Seq(
      (1L, "a b a b"),        // a->b x2, b->a x1
      (2L, "a b a c"),        // a->b, b->a, a->c
      (3L, "solo")            // no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(docs, 1L)
      .orderBy("w1", "w2").as[(String, String, Long, Double)].collect().toList
    // a: ->b 3, ->c 1 (P = .75/.25); b: ->a 2 (P = 1.0)
    assert(out === List(
      ("a", "b", 3L, 0.75), ("a", "c", 1L, 0.25), ("b", "a", 2L, 1.0)))
    // with minCount 2 the a->c row is filtered but a->b keeps P=0.75:
    // the normalizer saw the filtered row
    val kept = TextAnalysis.bigramLm(docs, 2L)
      .orderBy("w1", "w2").as[(String, String, Long, Double)].collect().toList
    assert(kept === List(("a", "b", 3L, 0.75), ("b", "a", 2L, 1.0)))
  }

  test("fuzzy match: blocked candidates verified by edit distance, no nested loop") {
    val left = Seq((1L, "chocolate lace"), (2L, "goldenrod dim"), (3L, "zzz"))
      .toDF("id", "name")
    val right = Seq((10L, "chocoXate lace"), (11L, "goldenrod dXm"),
      (12L, "chacolate lace")).toDF("id", "name")
    val df = FuzzyMatch.blocked(left, right, "id", "name",
      prefixLen = 5, suffixLen = 0, maxDist = 2)
    val out = df.select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    // 1<->10 share "choco", dist 1; 2<->11 share "golde", dist 1;
    // 12 ("chaco") is in a different block despite dist 1 — not recalled
    assert(out === Set((1L, 10L, 1), (2L, 11L, 1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("fuzzy match with a suffix window recalls middle edits, blocks end edits") {
    val left = Seq((1L, "abcdefghijkl")).toDF("id", "name")
    val right = Seq((10L, "abcXefghijkl"),   // middle edit: recalled
      (11L, "abcdefghijkX")).toDF("id", "name") // suffix edit: different block
    val out = FuzzyMatch.blocked(left, right, "id", "name",
        prefixLen = 3, suffixLen = 3, maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L)))
  }

  test("column profile: one row per column with exact stats") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (3.0, null)).toDF("x", "y")
    val out = Profile.numeric(df, Seq("x", "y")).orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toList
    assert(out === List(
      ("x", 3L, 0L, 3L, 1.0, 3.0, 2.0),
      ("y", 2L, 1L, 1L, 10.0, 10.0, 10.0)))
  }

  test("column profile plans without Expand: per-column pruned ndv scans") {
    // r9 verdict #2: the all-distincts-in-one-aggregate shape Expands the
    // scan |cols|+1 ways and carries every accumulator through
    // ObjectHashAggregate — a 5x blow-up at 100 TB. The pinned shape is
    // one base pass + one single-distinct hash aggregate per column:
    // |cols|+1 scans, each column-pruned, no Expand anywhere.
    val qe = Profile.numeric(
        Tables.lineitem(spark, sf), Seq("l_quantity", "l_tax"))
      .queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
    val scans = "Scan parquet".r.findAllIn(plan).toSeq.length
    assert(scans == 3, s"expected 3 pruned scans (base + 2 ndv), got $scans")
    // each ndv scan reads exactly one column
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(schemas.count(s => s.split(",").length == 1) >= 2, schemas.toString)
  }

  test("k-anonymity risk: exactly the classes under k, share over ALL rows") {
    val rows = Seq(
      ("us", "A"), ("us", "A"), ("us", "A"),       // class of 3 — safe at k=3
      ("us", "B"), ("us", "B"),                    // class of 2 — risky
      ("de", "A"))                                 // class of 1 — risky
      .toDF("country", "segment")
    val risky = Profile.kAnonymityRisk(rows, Seq("country", "segment"), k = 3)
      .orderBy("country", "segment")
      .as[(String, String, Long, Double)].collect().toList
    // share denominator is the WHOLE table (6), not just risky rows
    assert(risky === List(("de", "A", 1L, 0.166667), ("us", "B", 2L, 0.333333)))
    assert(Profile.kAnonymityRisk(
      rows.filter(col("country") === "xx"), Seq("country"), k = 3).count() == 0)
  }
}
