ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "psvmspark"
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
// The bench/verify harness parses a bounded tail of raw stdout. Two sbt
// behaviors break that: the logger prefixes forked-process output with
// "[info] ", and a "[success] Total time: ..." line lands AFTER the
// bench's final JSON line. Route forked output straight to stdout and
// drop the success banner so the bench summary is the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // 12g default: the host has 128 GiB; GC headroom keeps bench timings
  // stable when the driver runs the suite through sbt
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // match tools/run.sh: the ~1500 retained janino classes plus
  // Spark/MLlib fill the JVM's default 240m code cache until the
  // sweeper drops hot compiled methods (measured ~2x on the MLlib fit
  // queries, round 5). The sbt-run path — the one the driver's bench
  // uses — was still on the default.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "512m")}",
)
