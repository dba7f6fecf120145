ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlscriptsspark"
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
// r18: the full suite (674 tests) ran ~15 min in ONE forked JVM,
// sequentially — past the driver's test budget on a loaded host
// (VERIFY_r17 tests_ok=false was a tail truncation mid-suite, no FAILED
// marker). Same tests, same isolation guarantees, shorter wall: stripe
// the suites across N forked JVMs that run in parallel. Each group JVM
// gets its own SparkSession (SparkSpec.session is per-JVM) and its own
// fixture root (Queries.FixtureRoot is a per-JVM temp dir), so nothing
// is shared across groups. Alphabetical striping (index mod N) spreads
// the adjacent heavy Snapshot*/Txn* soak suites evenly.
// SPARK_GRAFT_TEST_GROUPS=1 restores the sequential single-JVM run.
val testGroups = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt.max(1)
Test / testGrouping := {
  val jvmOpts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % testGroups).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"group$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts)))
    }
}
// sbt's default concurrentRestrictions cap ForkedTestGroup at 1 —
// raise it so the groups actually run side by side.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroups),
  Tags.limitAll(math.max(testGroups + 2,
    java.lang.Runtime.getRuntime.availableProcessors())))
// Forked run output passes through VERBATIM instead of re-logged with
// an "[info] " prefix: the bench harness tail-parses the final JSON
// line from stdout, and a logger prefix breaks that parse.
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
  // 16g default: the bench/verify mains run 30+ queries in one JVM and
  // accumulate checkpoint blocks between cleanups (host has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
