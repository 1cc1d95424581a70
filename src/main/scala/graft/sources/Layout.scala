package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

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
}
