package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends SparkSuite {

  test("joins between co-bucketed tables shuffle nothing") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    // disable broadcast: at test scale Catalyst would broadcast the tiny
    // side; the bucketing claim is about the shuffle-join path (at real
    // scale both sides are too big to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // and the result is still correct
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("aggregation on the bucket key needs no exchange before partial agg") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_bucketed_agg", "l_orderkey", 8)
    try {
      val agg = Bucketing.table(spark, "li_bucketed_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
  }
}
