package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IncrementalStarJob
import graft.sources.BookmarkStore

/** End-to-end incremental job: run 1 over the initial fact table, new
  * rows "arrive", run 2 processes only the delta; a failed sink never
  * advances the bookmark (SURVEY.md §7.3 transactionality).
  */
class IncrementalStarJobSpec extends SparkSuite {

  /** A private sf dir whose lineitem we can grow between runs. */
  private def stagingDir(): String = {
    val dir = Files.createTempDirectory("incr-job").toString
    Seq("supplier", "part").foreach { t =>
      Tables.load(spark, sf, t).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def writeFact(dir: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("second run processes only newly-arrived fact rows; totals match one full run") {
    val dir = stagingDir()
    val store = new BookmarkStore(Files.createTempDirectory("incr-bm").toString)
    val full = Tables.lineitem(spark, sf)
    val cutoff = 15000L
    writeFact(dir, full.filter(col("l_orderkey") <= cutoff))

    var sunk = Map.empty[String, Long].withDefaultValue(0L)
    def sink(name: String, df: DataFrame): Unit =
      synchronized { sunk += name -> (sunk(name) + df.count()) }

    val r1 = IncrementalStarJob.run(spark, dir, store)(sink)
    assert(r1.rowsRead == full.filter(col("l_orderkey") <= cutoff).count())
    assert(store.get("lineitem", "star_job").contains(
      full.filter(col("l_orderkey") <= cutoff).agg(max("l_orderkey")).head().getLong(0)))

    // new rows arrive
    writeFact(dir, full)
    val r2 = IncrementalStarJob.run(spark, dir, store)(sink)
    assert(r2.rowsRead == full.filter(col("l_orderkey") > cutoff).count())
    assert(r1.rowsRead + r2.rowsRead == full.count())

    // a third run sees nothing new
    val r3 = IncrementalStarJob.run(spark, dir, store)(sink)
    assert(r3.rowsRead == 0 && r3.committed.isEmpty)
  }

  test("a failing sink aborts the run and leaves the bookmark untouched") {
    val dir = stagingDir()
    val store = new BookmarkStore(Files.createTempDirectory("incr-bm2").toString)
    writeFact(dir, Tables.lineitem(spark, sf))

    intercept[Exception] {
      IncrementalStarJob.run(spark, dir, store) { (name, df) =>
        if (name == "part_brand_report") throw new RuntimeException("sink down")
        df.count()
      }
    }
    assert(store.get("lineitem", "star_job").isEmpty,
      "failed sink must not advance the bookmark")

    // recovery: the rerun re-reads the same delta and commits
    val r = IncrementalStarJob.run(spark, dir, store)((_, df) => df.count())
    assert(r.rowsRead == Tables.lineitem(spark, sf).count())
    assert(store.get("lineitem", "star_job").nonEmpty)
  }
}
