package graft.sources

import java.nio.file.{Files, Paths}
import java.sql.DriverManager
import java.util.Properties
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC sink with idempotent "preactions" DDL — the reference's Redshift
  * sink re-expressed (SURVEY.md §2 S10, `glue_rds_to_redshift.py:83-93`).
  *
  * The reference stages to S3 and COPYs into Redshift after running a
  * `CREATE TABLE IF NOT EXISTS` preaction; the engine-level semantics are:
  * (1) run caller-supplied DDL on a plain JDBC connection (driver-side, one
  * statement batch), then (2) bulk-append the frame. Spark's JDBC writer
  * already does distributed batched inserts from executors — the 100 TB
  * path swaps step 2 for a staged bulk-load (write parquet to object store,
  * issue COPY) without changing this API.
  *
  * Fixes reference defects D7 (sink ignored its target parameter and
  * hardcoded one dbtable for both reports; preactions DDL had a syntax
  * error): here the target table is a real parameter and preactions are
  * caller-owned strings executed verbatim.
  */
object JdbcSink {

  /** Run `preactions` (e.g. CREATE TABLE IF NOT EXISTS ...) then append
    * `df` into `table` at `url`.
    */
  def writeWithPreactions(df: DataFrame, url: String, table: String,
                          preactions: Seq[String] = Nil,
                          props: Properties = new Properties()): Unit = {
    if (preactions.nonEmpty) {
      val conn = DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try preactions.foreach(st.execute) finally st.close()
      } finally conn.close()
    }
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** The reference's actual sink shape (`glue_rds_to_redshift.py:87-91`):
    * stage the frame to object storage, then bulk-load it into the
    * warehouse with COPY-style SQL over the same JDBC connection that ran
    * the preactions.
    *
    * Flow: (1) distributed CSV write of `df` into `stagingDir` (at 100 TB
    * this is the only data-sized step and it is executor-parallel — the
    * JDBC connection never carries row data); (2) on ONE driver-side
    * connection: preactions (DDL, autocommit), then one `copySql(table,
    * partPath)` statement per staged part file inside a single
    * transaction — all-or-nothing load, exactly how Redshift COPY is
    * wrapped in production. `copySql` is caller-owned because the load
    * verb is warehouse-specific (Redshift `COPY ... FROM 's3://...'`,
    * Derby `SYSCS_UTIL.SYSCS_IMPORT_TABLE`, DuckDB `COPY ... FROM`);
    * the engine owns staging, ordering, and transactionality.
    *
    * Returns the number of part files loaded.
    */
  /** Staged part files under `stagingDir`, sorted for deterministic load
    * order. Materializes (and closes) the directory stream.
    */
  private def listParts(stagingDir: String): Seq[String] = {
    val stream = Files.list(Paths.get(stagingDir))
    try stream.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".csv")
      }
      .map(_.toAbsolutePath.toString).toSeq.sorted
    finally stream.close()
  }

  def stagedBulkLoad(df: DataFrame, url: String, table: String,
                     stagingDir: String,
                     copySql: (String, String) => String,
                     preactions: Seq[String] = Nil,
                     props: Properties = new Properties()): Int = {
    df.write.mode(SaveMode.Overwrite).csv(stagingDir)
    val parts = listParts(stagingDir)
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        preactions.foreach(st.execute)
        conn.setAutoCommit(false)
        try {
          parts.foreach(p => st.execute(copySql(table, p)))
          conn.commit()
        } catch {
          case t: Throwable => conn.rollback(); throw t
        }
      } finally st.close()
    } finally conn.close()
    parts.size
  }

  /** Ledger DDL for [[stagedBulkLoadExactlyOnce]]; warehouse-idempotent
    * wrapping (IF NOT EXISTS) is caller-owned, like all preactions.
    */
  def loadLedgerDdl(ledgerTable: String): String =
    s"CREATE TABLE $ledgerTable (run_id VARCHAR(64) PRIMARY KEY)"

  /** [[stagedBulkLoad]] made idempotent under redelivery — the batch twin
    * of [[graft.streaming.StreamSink.exactlyOnceJdbc]], closing the
    * reference's signature failure mode: re-running the job without
    * bookmarks duplicates every row in the target
    * (`medium/transaction_by_subscription_report_messed.jpeg` — ids
    * 12004/12006/12008/12011 each loaded twice).
    *
    * A run ledger row and the COPY statements commit in ONE warehouse
    * transaction keyed by `runId` (e.g. the bookmark watermark of the
    * extract). A re-delivered run sees its ledger row and returns 0
    * WITHOUT re-staging — redelivery is a metadata no-op, never a
    * recompute. A racing concurrent delivery is backstopped by the
    * ledger's primary key: the second transaction's ledger insert fails
    * and everything it copied rolls back.
    *
    * `preactions` (caller-idempotent DDL) run on every call, before the
    * ledger check — they must be safe under redelivery just as on the
    * reference's Redshift (`CREATE TABLE IF NOT EXISTS`).
    *
    * Returns the number of part files loaded (0 on a deduplicated
    * redelivery).
    */
  def stagedBulkLoadExactlyOnce(df: DataFrame, url: String, table: String,
                                stagingDir: String,
                                copySql: (String, String) => String,
                                runId: String,
                                ledgerTable: String = "load_ledger",
                                preactions: Seq[String] = Nil,
                                props: Properties = new Properties()): Int = {
    val conn = DriverManager.getConnection(url, props)
    try {
      if (preactions.nonEmpty) {
        val st = conn.createStatement()
        try preactions.foreach(st.execute) finally st.close()
      }
      conn.setAutoCommit(false)
      val check = conn.prepareStatement(
        s"SELECT 1 FROM $ledgerTable WHERE run_id = ?")
      val delivered = try {
        check.setString(1, runId)
        val rs = check.executeQuery()
        try rs.next() finally rs.close()
      } finally check.close()
      if (delivered) { conn.rollback(); 0 }
      else {
        df.write.mode(SaveMode.Overwrite).csv(stagingDir)
        val parts = listParts(stagingDir)
        val st = conn.createStatement()
        try {
          parts.foreach(p => st.execute(copySql(table, p)))
          val ledger = conn.prepareStatement(
            s"INSERT INTO $ledgerTable VALUES (?)")
          try { ledger.setString(1, runId); ledger.executeUpdate() }
          finally ledger.close()
          conn.commit()
        } catch {
          case t: Throwable => conn.rollback(); throw t
        } finally st.close()
        parts.size
      }
    } finally conn.close()
  }
}
