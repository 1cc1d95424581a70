package graft.sources

import java.sql.DriverManager
import java.util.Properties
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
}
