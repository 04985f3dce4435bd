ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aws_de_final_projectspark"
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
// The bench/verify harness captures `sbt "runMain graft.Bench"` stdout
// (2>&1) and tail-parses the LAST line as JSON. Two sbt behaviors broke
// that (BENCH_r05 "parsed": null): forked-process output was routed
// through sbt's logger with an "[info] " prefix, and an "[success] Total
// time" line printed AFTER the JSON. StdoutOutput passes the forked
// process's stdout/stderr through verbatim; showSuccess drops the
// trailer. (Bench additionally prints its JSON after SparkSession.stop()
// so no late Spark output can land behind it.)
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap is CLAMPED to 16g regardless of SPARK_DRIVER_MEM: this workload's
// working set is < 4 GB at sf0.1, and measured end-to-end bench runs
// DEGRADE progressively under a ~90 GB G1 heap (same build: 63 s total
// at 8g vs 390-800 s at 96g, wall ≈ cpu, zero full GCs, empty JIT
// queues — mutator-side slowdown as the giant heap fills between rare
// collections). A right-sized heap is faster than a huge one here.
def clampHeap(v: String): String = {
  val gb = v.trim.toLowerCase match {
    case s if s.endsWith("g") => s.dropRight(1).toDouble
    case s if s.endsWith("m") => s.dropRight(1).toDouble / 1024
    case s => s.toDouble / (1L << 30)
  }
  if (gb > 16) "16g" else v
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${clampHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
