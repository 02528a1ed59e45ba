ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "conceptnetworkspark"
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
// The bench/verify consumer parses the LAST stdout line as JSON: pass the
// forked program's stdout through unprefixed (no "[info] " decoration) and
// drop sbt's trailing "[success] Total time: ..." line so the program's
// final println really is the last line of output.
run / outputStrategy := Some(StdoutOutput)
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
// Commit AND pre-touch the whole heap at JVM startup (the r10 "large-heap
// inflation" finding, BASELINE.md): with the JVM's default lazily-committed
// heap, a large -Xmx (the bench driver's env sets 64g — proven by a
// byte-exact peak_task_mem match) made every allocation-heavy query re-pay
// kernel first-touch page zeroing INSIDE its timed window — q60/q88/q121
// walls sat 3.7–6.2× their records for four rounds while the allocation-
// light calib probes read nominal, because Bench's System.gc() between
// queries lets G1 uncommit free regions that the next query then faults
// back in. Xms=Xmx stops G1 ever uncommitting; AlwaysPreTouch moves the
// one-time zeroing to startup, outside every timed window. Measured at
// 64g: lazy q60=10.2s / q88=15.9s / q121=4.4s → committed 3.0 / 1.9 /
// 1.7 s (records are 2.29 / 1.89 / 2.11).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Scoped to `run` (Bench/Verify/ScaleStress), NOT Test: a test JVM with
// SPARK_DRIVER_MEM=64g exported would otherwise commit+zero 64 GB at
// startup for a suite that needs none of it (r10 review).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
