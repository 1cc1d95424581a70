package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, PolyHash}

/** The engine's expressions registered as SQL functions via
  * SparkSessionExtensions (GraftSession wires them into every session).
  */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("all engine functions are callable from plain SQL") {
    val row = spark.sql(
      """SELECT
        |  poly_hash('hello') AS h,
        |  cosine_similarity(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                    array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c,
        |  size(shingle_hashes('abcd', 3)) AS ns,
        |  size(token_hashes('a b  c')) AS nt,
        |  size(minhash_signature(shingle_hashes('abcd', 3), 8)) AS nm,
        |  simhash(token_hashes('a b c a'), 16) AS sh,
        |  size(hyperplane_buckets(array_repeat(CAST(0.5 AS FLOAT), 64), 4, 8)) AS nb,
        |  bpe_merge_pair(array('a', 'a', 'a'), 'a', 'a') AS bp
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) == PolyHash.hash("hello"))
    assert(row.getDouble(1) == 1.0)
    assert(row.getInt(2) == 2)
    assert(row.getInt(3) == 3)
    assert(row.getInt(4) == 8)
    assert(row.getLong(5) >= 0)
    assert(row.getInt(6) == 4)
    assert(row.getSeq[String](7) == Seq("a a", "a"))
  }

  test("the imperative aggregates resolve from SQL, with canonicalizing casts") {
    val agg = spark.sql(
      """SELECT top_k(id, v, 2) AS tk, heavy_hitters(w, 2) AS hh
        |FROM VALUES (1L, 1.0D, 'a'), (2L, 2.0D, 'a'), (3L, 3.0D, 'b')
        |  AS t(id, v, w)""".stripMargin).collect()(0)
    val tk = agg.getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 3L), (2.0, 2L)))
    val hh = agg.getSeq[org.apache.spark.sql.Row](1)
    assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
    // non-canonical argument types (INT id, FLOAT value, BIGINT item)
    // must cast, not CCE mid-job
    val cast = spark.sql(
      """SELECT top_k(i, v, 1) AS tk, heavy_hitters(n, 4) AS hh
        |FROM VALUES (1, CAST(1.5 AS FLOAT), 7L), (2, CAST(0.5 AS FLOAT), 7L)
        |  AS t(i, v, n)""".stripMargin).collect()(0)
    assert(cast.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1))) == Seq((1.5, 1L)))
    assert(cast.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))) == Seq(("7", 2L)))
  }

  test("aliases resolve to the same kernels") {
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(3 AS FLOAT)), array(CAST(2 AS FLOAT))) AS c,
        |  size(minhash_sig(shingle_hashes('abcd', 3), 8)) AS nm,
        |  simhash64('a b c a', 16) AS sh,
        |  simhash(token_hashes('a b c a'), 16) AS sh2
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 8)
    assert(r.getLong(2) == r.getLong(3))
  }

  test("SQL kernels agree with the Column API on real documents") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).limit(100)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, poly_hash(text) AS fp, simhash64(text, 16) AS sh,
        |  minhash_signature(shingle_hashes(text, 3), 8) AS mh
        |FROM ext_docs""".stripMargin)
    val viaCols = docs.select(col("doc_id"),
      GraftFunctions.poly_hash(col("text")).as("fp"),
      GraftFunctions.simhashOf(col("text"), 16).as("sh"),
      GraftFunctions.minhashSignature(
        GraftFunctions.shingleHashes(col("text"), 3), 8).as("mh"))
    assert(viaSql.except(viaCols).isEmpty && viaCols.except(viaSql).isEmpty)
  }

  test("top_k via SQL matches the Column wrapper on real events") {
    val ev = Tables.events(spark, sf).limit(2000)
    ev.createOrReplaceTempView("ext_events")
    val viaSql = spark.sql(
      "SELECT top_k(event_id, value, 5) AS t FROM ext_events")
      .select(explode(col("t")).as("e")).select("e.id", "e.value")
      .as[(Long, Double)].collect().toSeq
    val viaCol = ev.agg(GraftFunctions.top_k(col("event_id"), col("value"), 5).as("t"))
      .select(explode(col("t")).as("e")).select("e.id", "e.value")
      .as[(Long, Double)].collect().toSeq
    assert(viaSql == viaCol && viaSql.size == 5)
  }

  test("sizing arguments must be literal integers") {
    intercept[Exception] {
      spark.sql("SELECT simhash64('a', CAST(id AS INT)) FROM range(2)").collect()
    }
  }

  test("literal-cosine rule rewrites to the prenormed kernel, bit-identically") {
    val emb = Tables.embeddings(spark, sf)
    val centroid: Seq[Float] = emb.orderBy(col("vec_id")).limit(1)
      .collect().head.getSeq[Float](1)
    val viaKernel = emb.select(col("vec_id"),
      GraftFunctions.cosineSimilarity(col("embedding"), typedlit(centroid)).as("c"))
    // the rewrite fired: the optimized plan carries cosine_to_const
    assert(viaKernel.queryExecution.optimizedPlan.toString.contains("cosine_to_const"),
      viaKernel.queryExecution.optimizedPlan.toString)
    // literal on the left rewrites too (cosine is symmetric)
    val flipped = emb.select(
      GraftFunctions.cosineSimilarity(typedlit(centroid), col("embedding")).as("c"))
    assert(flipped.queryExecution.optimizedPlan.toString.contains("cosine_to_const"))
    // bit-identical to the composed-HOF formulation the rule cannot touch
    val viaHof = emb.select(col("vec_id"),
      (GraftFunctions.dotProduct(col("embedding"), typedlit(centroid)) /
        (GraftFunctions.l2Norm(col("embedding")) * GraftFunctions.l2Norm(typedlit(centroid)))).as("c"))
    val a = viaKernel.orderBy("vec_id").select("c").as[Double].collect()
    val b = viaHof.orderBy("vec_id").select("c").as[Double].collect()
    assert(a.length == b.length && a.indices.forall(i =>
      java.lang.Double.doubleToRawLongBits(a(i)) == java.lang.Double.doubleToRawLongBits(b(i))))
  }

  test("literal-cosine rule keeps the zero-norm guard") {
    val zero: Seq[Float] = Seq.fill(4)(0.0f)
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Seq.fill(4)(0.0f)))
      .toDF("id", "v")
    val out = df.select(
      GraftFunctions.cosineSimilarity(col("v"), typedlit(zero)).as("c"))
      .as[Double].collect()
    assert(out.forall(_ == 0.0))
  }
}
