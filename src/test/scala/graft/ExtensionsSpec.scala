package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PolyHash

/** The engine's expressions registered as SQL functions via
  * SparkSessionExtensions (extensions apply at session construction, so
  * this suite builds its own session over the shared context).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("all engine functions are callable from plain SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = GraftSession.builder("local[4]", 4)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT
          |  poly_hash('hello') AS h,
          |  cosine_similarity(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
          |                    array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c,
          |  size(shingle_hashes('abcd', 3)) AS ns,
          |  size(token_hashes('a b  c')) AS nt,
          |  size(minhash_signature(shingle_hashes('abcd', 3), 8)) AS nm,
          |  simhash(token_hashes('a b c a'), 16) AS sh,
          |  size(hyperplane_buckets(array_repeat(CAST(0.5 AS FLOAT), 64), 4, 8)) AS nb
          |""".stripMargin).collect()(0)
      assert(row.getLong(0) == PolyHash.hash("hello"))
      assert(row.getDouble(1) == 1.0)
      assert(row.getInt(2) == 2)
      assert(row.getInt(3) == 3)
      assert(row.getInt(4) == 8)
      assert(row.getLong(5) >= 0)
      assert(row.getInt(6) == 4)

      // the imperative aggregates resolve from SQL too
      val agg = s.sql(
        """SELECT top_k(id, v, 2) AS tk, heavy_hitters(w, 2) AS hh
          |FROM VALUES (1L, 1.0D, 'a'), (2L, 2.0D, 'a'), (3L, 3.0D, 'b')
          |  AS t(id, v, w)""".stripMargin).collect()(0)
      val tk = agg.getSeq[org.apache.spark.sql.Row](0)
      assert(tk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 3L), (2.0, 2L)))
      val hh = agg.getSeq[org.apache.spark.sql.Row](1)
      assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))

      // non-canonical argument types (INT id, BIGINT item) must cast, not CCE
      val cast = s.sql(
        """SELECT top_k(i, v, 1) AS tk, heavy_hitters(n, 4) AS hh
          |FROM VALUES (1, CAST(1.5 AS FLOAT), 7L), (2, CAST(0.5 AS FLOAT), 7L)
          |  AS t(i, v, n)""".stripMargin).collect()(0)
      assert(cast.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1))) == Seq((1.5, 1L)))
      assert(cast.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1))) == Seq(("7", 2L)))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
