ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinewithsparkkafkaspark"
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
// The driver parses the forked Bench main's final stdout line as bare
// JSON. sbt's default forked-output strategy re-logs the child's stdout
// as `[info] ...` and appends its own `[success] Total time` line, so
// the metric line was never the last line nor bare (BENCH_r14–r16 all
// parsed: null). StdoutOutput passes the child's stdout/stderr through
// raw; showSuccess drops the trailing [success] banner.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command engine, not a task — exclude
// it from the unused-setting lint so the warning doesn't land on
// stdout right above the metric line.
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Local-harness JIT tuning. The oracle/bench suite runs ~85 distinct
  // queries over small SFs: almost every generated class executes a few
  // thousand rows and dies — far below HotSpot's default C2 thresholds —
  // so with defaults most of the suite runs interpreted/C1 while 30 of
  // 32 cores idle. Lowering the tier thresholds makes the (otherwise
  // idle) compiler threads promote code orders of magnitude sooner:
  // measured on the sf0.1 driver protocol this cut the 85-query cold
  // total from ~54 s to ~38 s with no query regressing beyond noise.
  // This tunes the LOCAL single-JVM harness only — a long-lived cluster
  // executor processing billions of rows reaches C2 regardless and
  // should keep JVM defaults (do not copy into executor extraJavaOptions).
  "-XX:Tier3InvocationThreshold=100",
  "-XX:Tier3BackEdgeThreshold=2000",
  "-XX:Tier4InvocationThreshold=1000",
  "-XX:Tier4BackEdgeThreshold=8000",
  "-XX:ReservedCodeCacheSize=512m",
)
