ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lambdarefarchmapreducespark"
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
// The bench driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt behaviors defeat that parse and are disabled here:
//  1. the "[success] Total time: ..." banner prints AFTER the program's
//     final line (BENCH_r15.json: rc=0 but parsed=null — the driver's
//     tail parse read the banner), and
//  2. forked-run output is logged through sbt with an "[info] " prefix
//     ("[info] {\"metric\":...}" is not valid JSON either) — pass the
//     child's stdout/stderr through untouched instead.
showSuccess := false
// showSuccess is consumed by sbt's command loop, not by settings/tasks —
// exclude it from the unused-key lint so the build stays warning-free
Global / excludeLintKeys += showSuccess
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A 403-entry bench/verify session generates >40k JIT nmethods
  // (every query compiles several whole-stage-codegen classes); the
  // JDK-17 default 240 MB segmented code cache saturates its
  // 'profiled nmethods' segment mid-sweep, after which HotSpot stops
  // tier-2/3 compiling and hot paths decay toward interpreted — the
  // measured "session aging" (late-sweep sub-second entries read
  // 2-3x their fresh-JVM times). 512 MB is JVM-arena sizing, not a
  // data-scale knob: it applies identically at any SF/cluster size.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
