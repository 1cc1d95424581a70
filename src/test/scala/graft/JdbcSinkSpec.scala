package graft

import java.nio.file.Files
import graft.sources.JdbcSink

/** Preactions JDBC sink (SURVEY.md §2 S10) against embedded Derby:
  * idempotent CREATE TABLE preaction + append-mode dupe semantics —
  * append twice duplicates rows (exactly the reference's documented
  * failure mode without bookmarks).
  */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private val dbDir = Files.createTempDirectory("derby").toString
  private def url = s"jdbc:derby:$dbDir/graftdb;create=true"
  private val ddl = Seq(
    // Derby has no CREATE TABLE IF NOT EXISTS; the sink takes caller DDL
    // verbatim, so emulate idempotency the Derby way in the test.
    """CREATE TABLE report (k INT, total DOUBLE)""")

  test("preaction creates target; append lands rows; re-append duplicates") {
    val df = Seq((1, 10.0), (2, 20.0)).toDF("k", "total")
    JdbcSink.writeWithPreactions(df, url, "report", ddl)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "report").load()
    assert(back.count() == 2)
    // second run, no preaction (table exists), append-mode => dupes
    JdbcSink.writeWithPreactions(df, url, "report")
    val back2 = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "report").load()
    assert(back2.count() == 4, "append without bookmarks duplicates (the 'messed' screenshot)")
  }

  // Derby's COPY verb: bulk-import one staged CSV part into `table`
  // (column-order positional, REPLACE=0 appends) — the warehouse-specific
  // statement the staged sink delegates to the caller.
  private def derbyCopy(table: String, path: String): String =
    s"CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(null, '${table.toUpperCase}', '$path', null, null, null, 0)"

  test("staged bulk load: distributed CSV staging then per-part COPY; preactions rerun idempotent") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0))
      .toDF("k", "total").repartition(2)
    val staging = Files.createTempDirectory("staging").toString
    val n = JdbcSink.stagedBulkLoad(df, url, "staged", staging, derbyCopy,
      Seq("CREATE TABLE staged (k INT, total DOUBLE)"))
    assert(n >= 1, "at least one part file staged and loaded")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "staged").load()
    assert(back.count() == 4)
    assert(back.agg(org.apache.spark.sql.functions.sum("total"))
      .head().getDouble(0) == 100.0)
    // second run: caller-idempotent preactions (table exists -> none),
    // fresh staging dir, COPY appends — same at-least-once semantics as
    // the direct JDBC append path
    val staging2 = Files.createTempDirectory("staging2").toString
    JdbcSink.stagedBulkLoad(df, url, "staged", staging2, derbyCopy)
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "staged").load().count() == 8)
  }

  test("staged bulk load is transactional: a failing copy statement rolls back prior parts") {
    val df = Seq((1, 1.0), (2, 2.0)).toDF("k", "total").repartition(2)
    val staging = Files.createTempDirectory("staging_rb").toString
    var calls = 0
    // stand-in copy verb: first part loads via INSERT, second is invalid
    // SQL — asserts the sink's one-transaction contract independent of
    // the warehouse's import internals
    def flaky(table: String, path: String): String = {
      calls += 1
      if (calls == 1) s"INSERT INTO $table VALUES (99, 9.9)" else "THIS IS NOT SQL"
    }
    intercept[java.sql.SQLException] {
      JdbcSink.stagedBulkLoad(df, url, "staged_rb", staging, flaky,
        Seq("CREATE TABLE staged_rb (k INT, total DOUBLE)"))
    }
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "staged_rb").load().count() == 0,
      "first part's insert must have been rolled back")
  }

  test("failed preaction aborts before any write") {
    val df = Seq((1, 10.0)).toDF("k", "total")
    intercept[java.sql.SQLException] {
      JdbcSink.writeWithPreactions(df, url, "never_created",
        Seq("THIS IS NOT SQL"))
    }
    intercept[Exception] {
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", "never_created").load().count()
    }
  }
}
