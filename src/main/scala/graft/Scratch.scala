package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Tracked scratch directories on SPARK-VISIBLE storage, for queries whose
  * executors write intermediate files the driver (or a later stage) reads
  * back — report sinks, staged loads.
  *
  * Unlike [[TempDirs]] (driver-local `java.io.tmpdir`, right for embedded
  * Derby and other genuinely driver-side scratch), the root here is a
  * deploy-time knob: `spark.graft.scratch.dir` if set — on a real cluster
  * a shared URI (HDFS/S3) every executor and the driver can reach — else
  * the first `spark.local.dir` entry, else `java.io.tmpdir` (equivalent in
  * local mode, where this engine is tested). All filesystem traffic goes
  * through Hadoop's `FileSystem`, so a cluster deployment only has to set
  * the one conf; an executor-written, driver-read sink under a per-node
  * tmpdir would only ever coincide in local mode.
  *
  * Every dir is registered and deleted in a JVM shutdown hook — repeated
  * verify/bench runs do not accumulate disk. Dirs that die earlier (their
  * consumer is fully materialized before the query returns) are freed
  * eagerly via [[delete]].
  */
object Scratch {

  private val registry = new ConcurrentLinkedQueue[(String, Configuration)]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var e = registry.poll()
    while (e != null) {
      val (dir, conf) = e
      try {
        val p = new HPath(dir)
        p.getFileSystem(conf).delete(p, true)
      } catch { case _: Throwable => () }
      e = registry.poll()
    }
  }, "graft-scratch-cleanup"))

  /** The configured scratch root for this session. */
  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratch.dir")
      .orElse(spark.sparkContext.getConf.getOption("spark.local.dir")
        .map(_.split(",").head))
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Create a tracked scratch dir under [[root]], deleted on JVM exit. */
  def create(spark: SparkSession, prefix: String): String = {
    val dir = s"${root(spark).stripSuffix("/")}/$prefix-${java.util.UUID.randomUUID()}"
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(dir)
    p.getFileSystem(conf).mkdirs(p)
    registry.add(dir -> conf)
    dir
  }

  /** Eagerly delete a dir created by [[create]]. */
  def delete(spark: SparkSession, dir: String): Unit = {
    val it = registry.iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
    val p = new HPath(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
