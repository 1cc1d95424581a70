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
