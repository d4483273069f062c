ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "indra_dbspark"
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
// Inherit the parent's stdout for forked `runMain` instead of routing
// through sbt's logger: graft.Bench emits machine-readable JSON lines
// that downstream parsers read from the raw stream, and the logger's
// "[info] " prefix breaks them.
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
  // 8g: measured as the better default — a 16g heap was tried against the
  // chain-inflation findings (old gen ~full under 8g) and made the same
  // query subset ~18% SLOWER (longer G1 young pauses dominate the saved
  // concurrent-GC work at this heap-to-live-set ratio); keep 8g and leave
  // SPARK_DRIVER_MEM as the override for bigger fixtures.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // a multi-hundred-query run compiles thousands of generated classes;
  // the default 240m code cache fills mid-run and JIT flushing then
  // re-profiles hot codegen'd kernels inside timed regions (reserve is
  // address space only — committed code-cache memory grows on demand)
  "-XX:ReservedCodeCacheSize=512m",
)
