package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // S12 job-argument resolution: --SPARK_GRAFT_SF_DIR on the CLI beats
    // the env var beats the default (JobArgs mirrors getResolvedOptions)
    val opts = JobArgs.resolve(args.toSeq, required = Nil,
      defaults = Map("SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.1",
        "SPARK_GRAFT_CPUS" -> "4",
        // comma-separated query-name filter for A/B timing a subset
        "SPARK_GRAFT_ONLY" -> ""))
    val sfDir = opts("SPARK_GRAFT_SF_DIR")
    val cpus = opts("SPARK_GRAFT_CPUS")
    val only = Option(opts("SPARK_GRAFT_ONLY")).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: session/codegen init + parquet footers, so the first measured
    // query reflects the query, not JVM startup.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: consumes every row and every column, so the timing
      // includes all expression work (count() lets Catalyst prune the
      // projection and under-measures map-only queries)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
