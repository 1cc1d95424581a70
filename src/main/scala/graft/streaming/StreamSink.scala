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
    *
    * `lineage` names the CHECKPOINT LIFETIME feeding this sink (use the
    * checkpoint location; stable across restarts of the same query, new
    * for a fresh checkpoint). It is stamped next to the watermark and
    * re-validated on every delivery — the [[graft.sources.StoreParams]]
    * FAISS-header rule for a sink (r12 advice): batchIds are only
    * monotonic WITHIN one checkpoint lineage, so an outDir that outlives
    * its checkpoint would otherwise treat every new batch below the old
    * watermark (fresh checkpoints restart at 0) as a redelivery and
    * silently DROP it. A mismatch refuses loudly; deliver a new lineage
    * into a fresh outDir instead. Wiping a checkpoint directory in place
    * and reusing its path breaks the contract — the path no longer names
    * one lifetime. Residual hole, by the grandfathering choice below: an
    * outDir written BEFORE this guard carries no stamp, so the first
    * new-lineage query to touch it still drops its sub-watermark batches
    * silently and then claims the dir — migrating pre-stamp sinks to
    * fresh outDirs is the operator's job.
    */
  def exactlyOnceParquet(outDir: String, batch: DataFrame, batchId: Long,
                         lineage: String): Unit = {
    require(lineage.nonEmpty, "lineage must name the checkpoint lifetime")
    val store = new graft.sources.BookmarkStore(outDir)
    val h = lineageHash(lineage)
    // foreach, not get: pre-stamp artifacts stay writable and are stamped
    // on their next commit (the StoreParams validation discipline)
    store.get("lineage", ParquetSinkCtx).foreach { prev =>
      require(prev == h,
        s"parquet sink at $outDir was written by a different checkpoint " +
          s"lineage (stamp $prev, caller ${h}); its batch-id watermark is " +
          "meaningless for a new checkpoint — new batches below it would be " +
          "silently dropped as redeliveries. Deliver into a fresh outDir.")
    }
    if (!store.get("last_batch", ParquetSinkCtx).exists(_ >= batchId)) {
      batch.write.mode("overwrite").parquet(s"$outDir/batch-$batchId")
      store.commitAll(ParquetSinkCtx,
        Map("last_batch" -> batchId, "lineage" -> h))
    }
  }

  /** 64-bit FNV-1a of the lineage string — [[graft.sources.BookmarkStore]]
    * slots hold longs, so the identity is stamped as a hash; a collision
    * only weakens the refuse-on-mismatch guard, never correctness.
    */
  private def lineageHash(s: String): Long = {
    var acc = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { acc = (acc ^ (s.charAt(i) & 0xffffL)) * 0x100000001b3L; i += 1 }
    acc
  }

  /** Every COMMITTED batch of an [[exactlyOnceParquet]] sink: the
    * compacted base (if [[compactParquet]] has run) plus batch
    * subdirectories committed after it, everything bounded by the
    * watermark — so a crashed batch's partial directory is never
    * visible, and neither is a crashed compact's orphan base. Requires
    * at least one committed batch (an unstarted sink has no schema to
    * offer).
    */
  def committedParquet(spark: org.apache.spark.sql.SparkSession,
                       outDir: String): DataFrame = {
    val store = new graft.sources.BookmarkStore(outDir)
    // read order matters (r13 ADVICE): `base` BEFORE `last_batch`. The two
    // gets are separate file reads; a concurrent compact committing
    // between them could otherwise surface base > watermark (rows beyond
    // the captured view). Any committed base is <= some already-committed
    // last_batch, so base-first can only yield a stale-but-safe base.
    val base = store.get("base", ParquetSinkCtx).getOrElse(-1L)
    val last = store.get("last_batch", ParquetSinkCtx)
    require(last.isDefined, s"no committed batches under $outDir")
    committedUpTo(spark, outDir, base, last.get)
  }

  /** The committed view bounded to CAPTURED watermarks — what
    * [[compactParquet]] folds from: re-deriving `last_batch` at scan
    * time would race a live query committing a batch between the fold's
    * capture and its read, folding that batch into the base while
    * readers still list its dir (permanent double-read).
    */
  private def committedUpTo(spark: org.apache.spark.sql.SparkSession,
                            outDir: String, base: Long, w: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      (if (base >= 0) Seq(new org.apache.hadoop.fs.Path(outDir, s"base-$base"))
       else Seq.empty) ++
        fs.listStatus(path).toSeq.map(_.getPath)
          // FULL-NAME parse ([[graft.sources.Generations.retireThrough]]'s
          // rule): an unanchored findFirstMatchIn would read a stray
          // `batch-3-bak` or `rebatch-7` dir as committed data
          .filter(p => batchIdOf(p.getName).exists(b => b > base && b <= w))
    spark.read.parquet(dirs.map(_.toString): _*)
  }

  /** COMPACTION for the parquet ledger sink — the
    * [[graft.sources.IvfPqIndex.compact]] discipline applied to the
    * OUTPUT table: one directory per micro-batch is what buys
    * exactly-once (the batch boundary IS the commit unit), but a
    * long-lived query accumulates thousands of them and every reader
    * pays listing + per-fragment footers forever. Fold the committed
    * view into `base-<watermark>`; readers then touch one consolidated
    * dir plus only the batches committed since. The base is fully
    * written BEFORE the `base` slot renames in (a crashed compact leaves
    * an orphan dir readers never list), the fold scans exactly the
    * captured `(base, watermark]` view (never the live one a running
    * query could advance mid-fold), redelivery semantics are untouched
    * (the `last_batch` watermark still governs), and retirement of
    * superseded dirs is opt-in — in-flight readers own the grace period.
    *
    * WRITER DISCIPLINE ([[graft.sources.IvfPqIndex.compact]]'s rule):
    * the properties-file commit is a whole-file read-modify-write, so
    * run compaction from the delivering query's own process between
    * micro-batches — a second concurrent writer handle can erase the
    * sink's `last_batch`/`lineage` commit (lost update).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     outDir: String, retireSuperseded: Boolean = false): Unit = {
    val store = new graft.sources.BookmarkStore(outDir)
    // base read BEFORE the watermark — the uniform reader rule (the
    // index stores' fragmentCount/compact order): base-first can only
    // yield a stale-but-safe base, never one ahead of the captured
    // watermark that committedUpTo would mis-handle
    val base = store.get("base", ParquetSinkCtx).getOrElse(-1L)
    val last = store.get("last_batch", ParquetSinkCtx)
    require(last.isDefined, s"no committed batches under $outDir")
    val w = last.get
    if (base == w) {
      // fold is a no-op but a REQUESTED retirement sweep still runs — a
      // prior no-retire compact's superseded dirs must not leak forever
      if (retireSuperseded) retireParquetThrough(spark, outDir, w)
      return
    }
    // fold EXACTLY the captured (base, w] view — never the live one
    committedUpTo(spark, outDir, base, w)
      .write.mode("overwrite").parquet(s"$outDir/base-$w")
    store.commit("base", ParquetSinkCtx, w)
    if (retireSuperseded) retireParquetThrough(spark, outDir, w)
  }

  /** Full-name directory-id parse — anchored, never a substring match: an
    * unanchored regex made the retire sweep DELETE any dir whose name
    * merely contained `batch-<n>` (a `batch-3-bak` backup, a `rebatch-7`
    * sibling) and the reader treat it as committed data.
    */
  private def batchIdOf(name: String): Option[Long] =
    if (name.startsWith("batch-")) name.stripPrefix("batch-").toLongOption
    else None

  private def baseIdOf(name: String): Option[Long] =
    if (name.startsWith("base-")) name.stripPrefix("base-").toLongOption
    else None

  private def retireParquetThrough(spark: org.apache.spark.sql.SparkSession,
                                   outDir: String, w: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val superseded = batchIdOf(p.getName).exists(_ <= w) ||
        baseIdOf(p.getName).exists(_ < w)
      if (superseded) fs.delete(p, true)
    }
  }

  private val ParquetSinkCtx = "parquet_sink"
}
