ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opentsdbspark"
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
// One forked JVM PER SUITE, several suites in parallel: each suite
// builds (and stops) its own SparkContext and some engine state is
// JVM-global (plugin registries, Introspect counters), so suites must
// not share a JVM concurrently — but across JVMs they are fully
// independent. Sequential single-JVM execution ran 28.5 min on 2 of
// 32 cores; per-suite JVMs at limit 6 fit the driver's test budget.
// The two heaviest suites are split into 4 classes each (same tests,
// same assertions) so no single group dominates the wall clock.
Test / testGrouping := (Test / definedTests).value.map { t =>
  Tests.Group(t.name, Seq(t),
    Tests.SubProcess(ForkOptions().withRunJVMOptions(
      (Test / javaOptions).value.toVector)))
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16),
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.getOrElse("SPARK_GRAFT_TEST_JVMS", "6").toInt))
// Pass the forked process's stdout through unprefixed: the bench/verify
// contract is ONE machine-parseable JSON line on stdout, and sbt's
// default LoggedOutput strategy prepends "[info] " to every line,
// which breaks the driver's json.loads of the bench output.
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
