ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kowarispark"
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
// Pass the forked process's stdout through UNMODIFIED instead of
// re-logging each line with an "[info] " prefix (the sbt default,
// LoggedOutput). The bench contract's final JSON metric line must be
// machine-parseable from the build output tail; since r07 every
// BENCH_r*.json carried `parsed: null` because the prefix (plus log
// framing) defeated the driver's parser even though the line was
// visibly present. sbt's own "[success] Total time" banner still
// follows after the process exits — the JSON line itself is now a
// bare line of stdout.
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
  // periodic ContextCleaner GCs (Bench sets
  // spark.cleaner.periodicGC.interval) must run as CONCURRENT cycles,
  // not stop-the-world full GCs inside a timed query
  "-XX:+ExplicitGCInvokesConcurrent",
  // 48g default (was 8g through r12): the bench host has 128 GiB and a
  // local[32] session IS the whole cluster — at 8g the suite logged
  // GCLocker allocation retries during the 10× probe's 512 MB array
  // allocations. Measured effect (r13): steady totals unchanged, cold
  // −5%, spread 1.11 → 1.03. See BASELINE.md "Fork heap" for the
  // in-suite-vs-isolated probe caveat; override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
