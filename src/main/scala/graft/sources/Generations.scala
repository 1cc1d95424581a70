package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the generational stores' compaction discipline
  * ([[IvfIndex]], [[IvfPqIndex]], [[PqIndex]]; the streaming ledger sink
  * reuses the same shapes with batch-keyed names). One implementation of
  * the two pieces every store was repeating: the committed-view directory
  * list BOUNDED TO A CAPTURED WATERMARK, and the listing-based retirement
  * sweep.
  *
  * The bounding matters for correctness, not just reuse: a compact that
  * reads "the committed view" through an accessor which RE-READS the
  * watermark races with a concurrent ingest — a generation committed
  * between the fold's watermark capture and its scan would be folded into
  * the base AND still listed as a tail generation, permanently
  * double-reading its rows. Folds must scan exactly the dirs of the
  * watermark they will stamp.
  */
private[sources] object Generations {

  /** The directories a reader at watermark `g` with compacted base
    * `base` (-1 = none) must scan: the base dir plus generations
    * strictly after it, nothing past `g`. `base > g` is REFUSED: a base
    * ahead of the captured watermark can only mean the single-writer
    * discipline was violated (a concurrent compact advanced the base
    * between the caller's two slot reads), and serving `base-<base>`
    * would silently return rows BEYOND the as-of watermark — a
    * discipline violation must fail loudly, never degrade into reading
    * future rows.
    */
  def dirs(base: Long, g: Long,
           genDir: Long => String, baseDir: Long => String): Seq[String] = {
    require(base <= g,
      s"compacted base $base is ahead of the captured watermark $g: " +
        "single-writer discipline violated (concurrent compact?)")
    (if (base >= 0) Seq(baseDir(base)) else Seq.empty) ++
      ((base + 1) to g).map(genDir)
  }

  /** Read exactly the committed view AS OF the captured watermark `g`. */
  def readAsOf(spark: SparkSession, base: Long, g: Long,
               genDir: Long => String, baseDir: Long => String): DataFrame =
    spark.read.parquet(dirs(base, g, genDir, baseDir): _*)

  /** Delete every directory a committed `base-<g>` supersedes: all
    * `gen-<i>` with i <= g and every `base-<j>` with j < g — including
    * dirs left by earlier compacts that did NOT retire (listing-based, a
    * complete sweep rather than a diff against the last compact).
    */
  def retireThrough(spark: SparkSession, dir: String, g: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      val gen = if (n.startsWith("gen-")) n.stripPrefix("gen-").toLongOption
        else None
      val base = if (n.startsWith("base-")) n.stripPrefix("base-").toLongOption
        else None
      if (gen.exists(_ <= g) || base.exists(_ < g)) fs.delete(p, true)
    }
  }
}
