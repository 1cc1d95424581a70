ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awsgluepysparkincrementalityandparallelismspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Keep a runMain's final stdout line as the program's own last line: the
// "[success] Total time ..." banner otherwise lands AFTER Bench's compact
// JSON summary and a bounded tail capture parses the banner instead of
// the summary (r7: BENCH_r07.json "parsed": null).
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
// Pass the forked program's stdout through UNPREFIXED: sbt's default
// LoggedOutput wraps every line in "[info] ", which defeated the driver's
// JSON parse of Bench's final summary line three rounds running (r9
// verdict #4 — BENCH_r09.json tail shows `[info] {"metric":...}`,
// "parsed": null). With StdoutOutput the summary line IS the process's
// last stdout line, byte-for-byte.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default (r17): the bench's own post-drain heap telemetry shows
  // the 207-query suite peaking at 6.7 GB live of the old 8 GB ceiling
  // (pagerank 6.8g, hybrid_batch_rrf 6.4g), and heavy rows ran 1.5-2x
  // their solo medians in-suite from GC pressure alone (sim_ivfpq_batch
  // 22.9 s in-suite vs 12.7 s solo, r16; same class again this round).
  // The sandbox has 128 GiB; a 32-core local session doing 20M-row
  // window sorts deserves more than 8. Still env-overridable — the
  // scale-rehearsal mains pin their own value via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
