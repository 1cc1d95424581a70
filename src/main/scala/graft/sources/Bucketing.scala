package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: the co-located-join scale path.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both sides
  * on the key. Writing both tables bucketed (and sorted) by that key fixes
  * the partitioning at write time: every subsequent join/aggregation on the
  * key reads co-located buckets and shuffles NOTHING — Catalyst recognizes
  * the bucket spec and drops both Exchanges (asserted in BucketingSpec).
  * Bucket count is chosen at write time to keep each bucket's per-task
  * working set inside executor memory at the target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table.
    *
    * Rerun-safe across JVMs: a managed table from a PREVIOUS session
    * leaves its warehouse directory behind while the new session's
    * catalog has no entry for it, and `saveAsTable` then refuses the
    * "already existing" location (LOCATION_ALREADY_EXISTS). Drop both
    * the catalog entry and any orphaned directory first.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
