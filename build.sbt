ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nyctlcanalyticspipelinespark"
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
// Forked `run`/`runMain` output passes through RAW (no `[info] ` logger
// prefix): the benchmark contract is ONE machine-parseable JSON line on
// stdout, and a logger prefix breaks any `^{...}$` line parse of the
// captured output. Scoping matters: `run / outputStrategy` is NOT in the
// delegation chain of `runMain / forkOptions` (round-3 BENCH artifact shows
// `[info] {"metric":...}` — still prefixed), so set it UNSCOPED at project
// level, which both `run` and `runMain` delegate to.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop the trailing `[success] Total time: ...` line so the bench JSON is
// the LAST stdout line a tail-capture sees.
Global / showSuccess := false
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
  // local[32] runs 32 concurrent tasks in ONE JVM; at sf0.1 the shuffle-
  // heavy suite queries allocate enough that a 16g heap forces collections
  // inside timed windows. The bench host has >100 GiB; headroom is free.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
