package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ParallelReports, StarPipeline}
import graft.sources.{BookmarkStore, IncrementalReader}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the large-scale pipeline
  * extensions) gets one entry in [[queries]]; anything expressible in ANSI
  * SQL also gets a DuckDB oracle in [[oracleSql]] with IDENTICAL column
  * aliases and a deterministic ORDER BY on both sides. Float aggregates are
  * round(x, 2) on both sides (Spark and DuckDB disagree in low bits on
  * double-sum order).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S7 hash aggregation, TPC-H Q1 flavor: partial+final HashAggregate.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // S2+S3+S4: rename -> chained broadcast inner equi-join -> projection.
    "star_denorm" -> ((s, dir) =>
      StarPipeline.denormalized(s, dir)
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // S7 report A over the denormalized frame (users-report semantics).
    "report_supplier" -> ((s, dir) =>
      StarPipeline.supplierReport(StarPipeline.denormalized(s, dir))
        .orderBy(col("s_suppkey"), col("register_date"))),

    // S7+S8 report B, collapsed to one output partition like the reference.
    "report_part_brand" -> ((s, dir) =>
      StarPipeline.partBrandReport(StarPipeline.denormalized(s, dir))
        .repartition(1)
        .orderBy(col("p_brand"), col("register_date"))),

    // S6+S11: both reports run concurrently from driver threads over one
    // cached frame, each pinned to its FAIR pool; results union'd.
    "parallel_reports" -> ((s, dir) => {
      val shared = StarPipeline.denormalized(s, dir).cache()
      val specs = Seq(
        ParallelReports.ReportSpec("supplier", "1", df =>
          StarPipeline.supplierReport(df)
            .select(concat(col("s_suppkey"), lit("|"), col("s_name")).as("report_key"),
              col("register_date"), col("total"))
            .withColumn("report", lit("supplier"))),
        ParallelReports.ReportSpec("part_brand", "2", df =>
          StarPipeline.partBrandReport(df)
            .select(col("p_brand").as("report_key"), col("register_date"), col("total"))
            .withColumn("report", lit("part_brand"))))
      val results = ParallelReports.run(s, shared, specs) { df =>
        val cached = df.cache(); cached.count(); cached
      }
      val out = results.map(_._2).reduce(_ union _)
        .orderBy(col("report"), col("report_key"), col("register_date"))
      shared.unpersist()
      out
    }),

    // S1 incremental scan: bookmark = floor(max(event_id)/2) committed to a
    // real BookmarkStore, then a second "run" reads strictly beyond it with
    // the predicate pushed into the parquet scan.
    "incremental_scan" -> ((s, dir) => {
      val stateDir = java.nio.file.Files.createTempDirectory("graft-bm").toString
      val store = new BookmarkStore(stateDir)
      val reader = new IncrementalReader(s, dir, store)
      val firstRunMax = reader.maxKey(Tables.events(s, dir), "event_id").getOrElse(0L)
      store.commit("events", "incr_scan", firstRunMax / 2)
      reader.read("events", "event_id", "incr_scan")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "star_denorm" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_partkey AS trn_partkey, l_suppkey AS trn_suppkey,
        |  l_extendedprice AS paid_amount, CAST(l_shipdate AS DATE) AS register_date,
        |  s_name, s_nationkey, p_brand, p_type, p_size
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "report_supplier" ->
      """SELECT l_suppkey AS s_suppkey, s_name,
        |  CAST(l_shipdate AS DATE) AS register_date,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2, 3
        |ORDER BY s_suppkey, register_date""".stripMargin,

    "report_part_brand" ->
      """SELECT p_brand, CAST(l_shipdate AS DATE) AS register_date,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2
        |ORDER BY p_brand, register_date""".stripMargin,

    "parallel_reports" ->
      """SELECT * FROM (
        |  SELECT CAST(l_suppkey AS VARCHAR) || '|' || s_name AS report_key,
        |    CAST(l_shipdate AS DATE) AS register_date,
        |    round(sum(l_extendedprice), 2) AS total, 'supplier' AS report
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |  UNION ALL
        |  SELECT p_brand AS report_key, CAST(l_shipdate AS DATE) AS register_date,
        |    round(sum(l_extendedprice), 2) AS total, 'part_brand' AS report
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |) ORDER BY report, report_key, register_date""".stripMargin,

    "incremental_scan" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE event_id > (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)
        |ORDER BY event_id""".stripMargin
  )
}
