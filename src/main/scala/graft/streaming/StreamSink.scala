package graft.streaming

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.DataFrame

/** Exactly-once streaming delivery into a JDBC warehouse.
  *
  * Structured Streaming's `foreachBatch` gives at-least-once: after a
  * crash between sink write and checkpoint commit, the batch is
  * re-delivered and a plain append duplicates it — the streaming twin of
  * the reference's duplicate-reload failure mode. The standard fix is a
  * transactional batch ledger: rows and the (query, batchId) ledger entry
  * commit in ONE warehouse transaction, so a re-delivered batch sees its
  * ledger row and becomes a no-op.
  *
  * This sink targets AGGREGATE outputs (the engine's report shapes):
  * each micro-batch's result is a bounded set of group rows, collected on
  * the driver and inserted over a single connection/transaction. That
  * driver hop is what buys atomicity with the ledger — executor-parallel
  * JDBC writes each open their own transaction and cannot be atomic with
  * it. For data-sized streams, stage the batch to object storage and
  * COPY + ledger in one transaction instead
  * ([[graft.sources.JdbcSink.stagedBulkLoad]] is that verb for batch).
  */
object StreamSink {

  /** Ledger DDL, warehouse-idempotent form is caller-owned (H2/Derby
    * lack a common IF NOT EXISTS).
    */
  def ledgerDdl(ledgerTable: String): String =
    s"CREATE TABLE $ledgerTable (query_id VARCHAR(64), batch_id BIGINT, " +
      "PRIMARY KEY (query_id, batch_id))"

  /** A `foreachBatch` function delivering each micro-batch exactly once.
    *
    * `insertSql` is the parameterized INSERT for one output row (e.g.
    * `INSERT INTO t VALUES (?, ?)`); `bind` sets its parameters from a
    * Row. The batch's rows and the ledger entry commit atomically.
    */
  def exactlyOnceJdbc(url: String, insertSql: String, ledgerTable: String,
                      queryId: String, props: Properties = new Properties())
                     (bind: (java.sql.PreparedStatement, org.apache.spark.sql.Row) => Unit)
  : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val check = conn.prepareStatement(
        s"SELECT 1 FROM $ledgerTable WHERE query_id = ? AND batch_id = ?")
      val delivered = try {
        check.setString(1, queryId); check.setLong(2, batchId)
        val rs = check.executeQuery()
        try rs.next() finally rs.close()
      } finally check.close()
      if (!delivered) {
        // collect only AFTER the ledger check: crash-redelivery (the case
        // this sink exists for) must be a metadata no-op, not a full
        // recompute of the batch. Bounded: aggregate output rows only
        // (see scaladoc). A racing duplicate delivery is backstopped by
        // the ledger's primary key — the second commit fails and rolls
        // back.
        val rows = batch.collect()
        val ins = conn.prepareStatement(insertSql)
        try {
          rows.foreach { r => bind(ins, r); ins.addBatch() }
          ins.executeBatch()
        } finally ins.close()
        val ledger = conn.prepareStatement(
          s"INSERT INTO $ledgerTable VALUES (?, ?)")
        try { ledger.setString(1, queryId); ledger.setLong(2, batchId); ledger.executeUpdate() }
        finally ledger.close()
        conn.commit()
      } else {
        conn.rollback() // nothing to do; release the read
      }
    } catch {
      case t: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw t
    } finally conn.close()
  }

  /** Exactly-once parquet delivery for a `foreachBatch` sink: each
    * micro-batch lands in a batchId-keyed subdirectory
    * (`outDir/batch-<id>`) and the committed watermark advances via the
    * bookmark store's atomic properties-file rename ONLY after the
    * parquet is fully written — the [[graft.sources.IvfPqIndex.appendBatch]]
    * discipline for a plain output table. Crash-redelivery is therefore
    * a no-op for committed batches (watermark check) and an overwrite
    * for a batch whose write crashed mid-flight (its watermark never
    * advanced, so the partial directory is invisible to readers and the
    * redelivered write replaces it). A plain `mode("append")` parquet
    * sink, by contrast, DUPLICATES every redelivered row (r11 verdict
    * #3: `stream_lm_gate` shipped exactly that).
    */
  def exactlyOnceParquet(outDir: String, batch: DataFrame, batchId: Long): Unit = {
    val store = new graft.sources.BookmarkStore(outDir)
    if (!store.get("last_batch", ParquetSinkCtx).exists(_ >= batchId)) {
      batch.write.mode("overwrite").parquet(s"$outDir/batch-$batchId")
      store.commit("last_batch", ParquetSinkCtx, batchId)
    }
  }

  /** Every COMMITTED batch of an [[exactlyOnceParquet]] sink — reads only
    * subdirectories at or below the watermark, so a crashed batch's
    * partial directory is never visible. Requires at least one committed
    * batch (an unstarted sink has no schema to offer).
    */
  def committedParquet(spark: org.apache.spark.sql.SparkSession,
                       outDir: String): DataFrame = {
    val store = new graft.sources.BookmarkStore(outDir)
    val last = store.get("last_batch", ParquetSinkCtx)
    require(last.isDefined, s"no committed batches under $outDir")
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rx = "batch-(\\d+)".r
    val dirs = fs.listStatus(path).toSeq.map(_.getPath)
      .filter(p => rx.findFirstMatchIn(p.getName)
        .exists(_.group(1).toLong <= last.get))
    spark.read.parquet(dirs.map(_.toString): _*)
  }

  private val ParquetSinkCtx = "parquet_sink"
}
