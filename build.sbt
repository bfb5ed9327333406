ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkasparkstreamingpipelinespark"
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
// as JSON. Two sbt behaviors broke that for three rounds running: the
// "[success] Total time..." banner printed after the metric line, and the
// "[info] " prefix on forked-process output. Suppress both so the forked
// main's final println IS the final raw stdout line.
Global / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys ++= Set(run / outputStrategy, Global / showSuccess)
// Streaming suites share one SparkSession and the process-wide Metrics
// registry; parallel suites race on both (observed flake: a counter
// asserted by one suite incremented by another's pipeline).
Test / parallelExecution := false
// DurableSinksSpec's chaos case needs task retries (master local[4, 2]),
// but suite-wide retries would silently mask one-shot flaky task
// failures in every other test. Fork that one suite into its own JVM
// with the retry master; everything else stays fail-fast local[4].
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def group(name: String, ts: Seq[TestDefinition], extra: Seq[String]) =
    Tests.Group(name, ts, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(opts ++ extra)))
  val (chaos, rest) = tests.partition(_.name.endsWith("DurableSinksSpec"))
  Seq(
    group("chaos-retry", chaos, Seq("-Dgraft.spec.master=local[4, 2]")),
    group("main", rest, Seq.empty))
}
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
