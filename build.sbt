ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "iahadooptoolsspark"
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
// forward sbt's stdin to the forked JVM: the stdin-fed CLI verbs
// (fs-mv, fs-sync, fs-cat -, cluster-build -) are unusable via
// `sbt runMain` without this
run / connectInput := true
// The bench driver parses the LAST raw stdout line of `sbt runMain
// graft.Bench` as the summary JSON. Two pieces of sbt framing defeat
// that: the logger's "[info] " prefix on forked-process stdout, and the
// trailing "[success] Total time: ..." line. StdoutOutput passes the
// forked JVM's stdout/stderr through unprefixed; showSuccess drops the
// trailer — so graft.Bench's summary println is the process's final
// raw stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — the
// unused-key lint can't see that
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
  // 53 bench/verify queries × reps compile thousands of whole-stage-codegen
  // classes; the JDK default code cache (240m) can fill late in the run,
  // silently disabling JIT and inflating tail-query wall times
  "-XX:ReservedCodeCacheSize=512m",
)
