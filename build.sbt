ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions += "-deprecation"
ThisBuild / version := "0.1.0"
name := "vectordbapispark"
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
// Forked run/runMain output goes straight to this process's stdout/stderr
// with NO sbt log prefix: the driver's bench scraper json-parses stdout
// lines, and the `[info] `/`[error] ` prefixes sbt's logger adds to forked
// output are what kept BENCH_r07/r08 "parsed": null.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
// Parallel unit suites (optimization r16, VERDICT r15 item 3): the suites
// are independent (every engine test writes its own scratch root; suites
// sharing a JVM share one local[4] SparkSession via getOrCreate), but a
// single forked JVM ran all of them SEQUENTIALLY — a ~38-minute critical
// path that no longer fit the harness budget. Group the suites into a
// handful of forked JVMs balanced by measured r15 durations and let sbt
// run the groups concurrently: identical tests and per-JVM session
// config, wall time ~ the slowest group. 6 groups x local[4] task
// threads fit the 32-core host; heap stays the same per JVM.
val testGroupOf: String => String = {
  case s if s.contains("EngineFuzzIndexedA") => "fuzz-compressed"
  case s if s.contains("EngineFuzzIndexedB") => "fuzz-graph"
  case s if s.contains("EngineFuzzIndexedC") => "fuzz-binary"
  case s if s.contains("EngineFuzz")         => "fuzz-crud"
  case s if s.contains("EngineSpec")         => "engine"
  case s if s.contains("HnswSpec") || s.contains("NswSpec") ||
             s.contains("CurateSpec")        => "graph-curate"
  case _                                     => "rest"
}
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name)).map {
    case (g, ts) => Tests.Group(g, ts, Tests.SubProcess(opts))
  }.toSeq
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(16),
)
