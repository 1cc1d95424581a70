package graft

import org.apache.spark.sql.SparkSession
import graft.operators.ParallelReports

/** One place for the engine's session defaults, shared by the driver mains
  * and the test suites.
  *
  *  - shuffle partitions sized to the core count, not Spark's default 200
  *    (local mode; on a cluster this is a deploy-time knob + AQE coalescing)
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting
  *  - FAIR scheduler + the reference-equivalent pool allocation file, so
  *    [[graft.operators.ParallelReports]] pool pinning is live (SURVEY §2 S11)
  *  - UTC session timezone: the testdata `events.ts` column is parquet
  *    TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ); pinning
  *    UTC makes `unix_timestamp` epoch math agree with the DuckDB oracle's
  *    `epoch(ts)` regardless of host timezone. All second-derivation goes
  *    through [[Tables.eventSeconds]].
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      // SQL surface for the native kernels (poly_hash, cosine_sim, ...)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // State-store maintenance races session shutdown (a timer firing
      // mid-stop logs "SparkEnv not active" with a full stack trace —
      // noise that can land after a main's final output line). The
      // micro-stream state dirs here are session scratch; pushing the
      // first maintenance tick past any realistic run lifetime disarms
      // the race without changing state semantics.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "6h")
    ParallelReports.fairConfig.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }
}
