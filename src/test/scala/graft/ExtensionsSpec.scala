package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, PolyHash}

class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("poly_hash via SQL equals the scalar kernel") {
    assert(spark.sql("SELECT poly_hash('abc') AS h").as[Long].head()
      == PolyHash.hash("abc"))
  }

  test("dot_product and cosine_sim on float-array literals") {
    val r = spark.sql(
      """SELECT
        |  dot_product(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |              CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d,
        |  cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |             CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS one,
        |  cosine_sim(CAST(array(0.0, 0.0) AS ARRAY<FLOAT>),
        |             CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS zero
        |""".stripMargin).as[(Double, Double, Double)].head()
    assert(r == ((11.0, 1.0, 0.0)))
  }

  test("SQL kernels agree with the Column API on real documents") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).limit(100)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, poly_hash(text) AS fp, simhash64(text, 16) AS sh,
        |  minhash_sig(shingle_hashes(text, 3), 8) AS mh
        |FROM ext_docs""".stripMargin)
    val viaCols = docs.select(col("doc_id"),
      GraftFunctions.poly_hash(col("text")).as("fp"),
      GraftFunctions.simhashOf(col("text"), 16).as("sh"),
      GraftFunctions.minhashSignature(
        GraftFunctions.shingleHashes(col("text"), 3), 8).as("mh"))
    assert(viaSql.except(viaCols).isEmpty && viaCols.except(viaSql).isEmpty)
  }

  test("aggregates: top_k_agg and heavy_hitters_agg resolve and match") {
    val ev = Tables.events(spark, sf).limit(2000)
    ev.createOrReplaceTempView("ext_events")
    val viaSql = spark.sql(
      "SELECT top_k_agg(event_id, value, 5) AS t FROM ext_events")
      .select(explode(col("t")).as("e")).select("e.id", "e.value")
      .as[(Long, Double)].collect().toSeq
    val viaCol = ev.agg(GraftFunctions.top_k(col("event_id"), col("value"), 5).as("t"))
      .select(explode(col("t")).as("e")).select("e.id", "e.value")
      .as[(Long, Double)].collect().toSeq
    assert(viaSql == viaCol && viaSql.size == 5)
    val hh = spark.sql(
      "SELECT heavy_hitters_agg(event_type, 10) AS h FROM ext_events")
      .select(explode(col("h"))).count()
    assert(hh > 0)
  }

  test("sizing arguments must be literal integers") {
    intercept[Exception] {
      spark.sql("SELECT simhash64('a', CAST(id AS INT)) FROM range(2)").collect()
    }
  }
}
