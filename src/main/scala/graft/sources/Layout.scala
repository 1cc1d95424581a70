package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout writer: range-clustered, size-targeted parquet.
  *
  * At 100 TB the scan cost of every later query is decided at WRITE time:
  * parquet row-group min/max statistics only prune when values are
  * clustered, and a table written from an arbitrary shuffle interleaves
  * key ranges across every file, so each file's [min, max] spans the
  * whole domain and nothing prunes. `clusteredWrite` range-partitions on
  * the cluster keys (`repartitionByRange` samples the distribution, so
  * partitions are balanced even under skew), sorts within each partition
  * (row-group-level stats become tight, not just file-level), and caps
  * rows per file so single hot ranges can't produce multi-GB files.
  *
  * The result: a filter on a leading cluster key touches the few files
  * whose range overlaps — the same effect Z-ordering targets for ONE key
  * dimension, with only built-in operators (one range shuffle + local
  * sort, no custom layout codec).
  */
object Layout {

  def clusteredWrite(df: DataFrame, path: String, numFiles: Int,
                     maxRecordsPerFile: Long, clusterCols: Column*): Unit = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    df.repartitionByRange(numFiles, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Interleave `bitsPerCol`-bit cells into one Z (Morton) value: bit `b`
    * of cell `i` lands at position `b * n + i`, so no two input bits
    * collide and the sum below is a bitwise OR. Pure integer shift/mask
    * arithmetic — codegen'd, map-only.
    */
  def zorder(bitsPerCol: Int, cells: Column*): Column = {
    val n = cells.length
    require(n >= 1 && bitsPerCol >= 1 && bitsPerCol * n <= 60,
      "z value must fit a long")
    (0 until bitsPerCol).flatMap { b =>
      cells.zipWithIndex.map { case (cell, i) =>
        shiftleft(shiftright(cell, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ + _)
  }

  /** Z-order-clustered parquet: like [[clusteredWrite]] but clustered on
    * the Morton interleave of ALL `zCols`, so a range filter on ANY of
    * them prunes files/row-groups — a single-key range layout prunes only
    * its leading key. Cells come from linear min/max binning (bounds are
    * one driver-side stats row, O(cols) metadata): map-only, no
    * per-column rank shuffle; heavy skew costs pruning selectivity, not
    * balance — the range partitioning on the z value still samples the
    * actual distribution.
    */
  def zorderWrite(df: DataFrame, path: String, numFiles: Int,
                  maxRecordsPerFile: Long, bitsPerCol: Int, zCols: Column*): Unit = {
    require(zCols.nonEmpty, "need at least one z column")
    val stats = df.select(zCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("double")).as(s"lo$i"), max(c.cast("double")).as(s"hi$i"))
    }: _*).head()
    val buckets = 1L << bitsPerCol
    val cells = zCols.zipWithIndex.map { case (c, i) =>
      // empty input / all-NULL column: no bounds, so the whole column is
      // one cell (and an empty dataset still writes, like clusteredWrite)
      if (stats.isNullAt(2 * i)) lit(0L)
      else {
      val lo = stats.getDouble(2 * i)
      val hi = stats.getDouble(2 * i + 1)
      if (hi == lo) lit(0L)
      else coalesce(
        least(greatest(
          width_bucket(c.cast("double"), lit(lo), lit(hi), lit(buckets)) - 1,
          lit(0L)), lit(buckets - 1)),
        lit(0L))
      }
    }
    df.withColumn("_z", zorder(bitsPerCol, cells: _*))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
