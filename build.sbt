ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hawkpackspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the driver tail-parses Bench's one-line JSON, and an "[info] " prefix
// (or log-level remapping to [error]) would break that contract.
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
  // 12g default (round-19): one local[32] JVM carries 32 concurrent
  // tasks plus the pinned index images; at 8g the catalog pass spent
  // 25-34 s in GC (env.gc_total_s in BENCH_FULL.json), part of it inside
  // timed queries. 12g on the 128 GiB bench host roughly halves that;
  // still overridable via SPARK_DRIVER_MEM (production sizes driver and
  // executors separately — this only shapes the local harness JVM).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
