ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flink1122spark"
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
// Pass the forked runMain JVM's stdout through unprefixed: the bench
// driver tails the process output and parses the last line as bare
// JSON; sbt's default logger-backed output strategy prefixes every
// line with "[info] ", which defeats that parse.
run / outputStrategy := Some(StdoutOutput)
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
  // Runtime bloom-filter join gate (r16): Spark's injection rule is ON by
  // default but its 10 GiB application-side-scan gate never fires on this
  // suite below ~sf100. The crossover measured on the verbatim TPC-DS
  // fact-fact joins is between sf0.1 and sf1 (q72 1.7x, q22 1.3x faster at
  // sf1; uniform ~13% LOSS when forced at sf0.1), so gate on 64 MB: by
  // construction inert at sf0.1 (largest fixture file is 11 MB — executed
  // plans verified byte-identical, 0 might_contain) and active from sf1 up
  // (lineitem 124 MB). The threshold is compared against actual scan size,
  // so it is scale-adaptive, not a local[32] constant. Mirrored in the
  // plain-java record scripts (tools/host_precheck.sh, run_sf1_full.sh,
  // run_sf10_smoke.sh) so scale records match `sbt runMain` behavior.
  "-Dspark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold=64MB",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
