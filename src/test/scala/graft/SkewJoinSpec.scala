package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSuite {

  test("salted join returns exactly the rows of the plain join") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("value"))
    val dim = ev.groupBy(col("user_id")).agg(round(sum(col("value")), 2).as("user_total"))
    val plain = ev.join(dim, Seq("user_id"))
      .select("event_id", "user_id", "user_total")
    val salted = SkewJoin.salted(ev, dim, "user_id", buckets = 8, bigSalt = col("event_id"))
      .select("event_id", "user_id", "user_total")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = Seq.tabulate(100)(i => (i.toLong, 1L)).toDF("event_id", "user_id")
    val salted = hot.withColumn("__salt", pmod(col("event_id"), lit(8)).cast("int"))
    val buckets = salted.select("__salt").distinct().count()
    assert(buckets == 8)
  }
}
