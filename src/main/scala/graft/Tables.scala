package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Per-table catalog metadata (SURVEY.md §1.1): where the table lives
  * relative to a scale-factor root, and — for append-only tables — the
  * ascending key that job bookmarks track. Dimension tables have no
  * bookmark key: they are snapshot-replaced, not incrementally appended.
  */
final case class TableMeta(name: String, location: String,
                           bookmarkKey: Option[String] = None)

/** Catalog over the driver-generated testdata (TESTDATA.md).
  *
  * The reference resolves table *names* through the Glue Data Catalog
  * (`glue_rds_to_redshift.py:28,32,37`) rather than declaring schemas in
  * code; this object is the Spark-native analogue — name ->
  * (schema, location, bookmark key). Schemas are schema-on-read from
  * parquet footers, resolved once per (sfDir, table) and cached (at
  * cluster scale this is the metastore lookup that saves re-listing a
  * 100 TB directory per query). All reads go through here so that column
  * pruning / predicate pushdown stay visible in one place, and so
  * incremental readers resolve bookmark keys from the catalog instead of
  * hard-coding them at call sites.
  */
object Tables {
  val meta: Map[String, TableMeta] = Seq(
    TableMeta("region", "region.parquet"),
    TableMeta("nation", "nation.parquet"),
    TableMeta("customer", "customer.parquet"),
    TableMeta("supplier", "supplier.parquet"),
    TableMeta("part", "part.parquet"),
    TableMeta("orders", "orders.parquet", bookmarkKey = Some("o_orderkey")),
    TableMeta("lineitem", "lineitem.parquet", bookmarkKey = Some("l_orderkey")),
    TableMeta("events", "events.parquet", bookmarkKey = Some("event_id")),
    TableMeta("documents", "documents.parquet", bookmarkKey = Some("doc_id")),
    TableMeta("embeddings", "embeddings.parquet", bookmarkKey = Some("vec_id"))
  ).map(t => t.name -> t).toMap

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Catalog-declared bookmark key for an incrementally-scanned table. */
  def bookmarkKey(name: String): String =
    meta.get(name).flatMap(_.bookmarkKey).getOrElse(
      throw new IllegalArgumentException(
        s"table '$name' has no bookmark key in the catalog"))

  private def location(name: String): String =
    meta.get(name).map(_.location).getOrElse(s"$name.parquet")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/${location(name)}")

  private val schemaCache = new ConcurrentHashMap[(String, String), StructType]()

  /** Footer-resolved schema, cached per (sfDir, table). */
  def schema(spark: SparkSession, sfDir: String, name: String): StructType =
    schemaCache.computeIfAbsent((sfDir, name), _ => load(spark, sfDir, name).schema)

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
