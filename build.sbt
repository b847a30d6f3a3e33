ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duvaspark"
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
// The driver machine-parses the LAST stdout line of `sbt "runMain
// graft.Bench"` as JSON. Two sbt behaviors defeated that for nine
// rounds: the logger prefixes forked-process output with "[info] ", and
// sbt appends its own "[success] Total time: …" as the true final line.
// StdoutOutput pipes the forked JVM's stdout through unprefixed, and
// showSuccess := false drops the success footer, so the bench's compact
// JSON line really is the last thing on stdout.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += outputStrategy
// A full `sbt test` starts from a CLEAN report directory: scratch
// testOnly runs otherwise leave orphaned suite XMLs behind in
// target/test-reports, so anyone aggregating the directory counts
// suites that the run never executed (r14: a deleted scratch spec's
// stale XML read as a 42nd suite). testOnly itself is untouched —
// partial report sets are its normal output.
Test / test := (Test / test)
  .dependsOn(Def.task { IO.delete(target.value / "test-reports") })
  .value
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
)
