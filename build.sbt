ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databasequeryprocessorspark"
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
// Forked-run stdout must reach the caller raw (no sbt "[info] " prefix):
// the bench driver parses one JSON line from stdout.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Hang-proof test gate: all 60+ Spark suites used to share ONE forked
// JVM; under accumulated heap pressure Spark GC'd live accumulators
// while tasks were in flight and AQE's withFinalPlanUpdate then waited
// forever on a stage whose completion event was lost — an un-failable
// stall (observed once in a judge run, SizingIntegrationSpec). Split
// the suites across several forked JVMs so no single heap carries the
// whole run; suites inside a group still share that JVM's one
// SparkSession (SparkSpec.spark is a per-JVM lazy). sbt's default
// Tags.limit(ForkedTestGroup, 1) runs the groups sequentially, so the
// 32-thread local Spark sessions never contend. The per-TEST time
// limit (the other half of hang-proofing) lives in SparkSpec:
// TimeLimitedTests + a thread-dumping Signaler turns a hang into a
// FAILURE with evidence.
Test / testGrouping := {
  val groups = 4
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value
    .groupBy(t => math.abs(t.name.hashCode) % groups)
    .toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"jvm-$i", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
