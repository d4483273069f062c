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
// Heap sized to TASK-THREAD CONCURRENCY, not a constant: local[N] runs N
// concurrent tasks in this one heap, and execution memory is split per
// task — a fixed 8g that is comfortable for 8 threads starves 32 (the
// round-12 full-suite ground truth: sort/parse-heavy queries 5-25x slower
// at local[32] than local[8] on the same code and data, classic
// spill/GC-thrash; an 8g-vs-16g A/B on a 19-query mini-chain had said
// otherwise and was invalidated by the full suite). 0.75 GB per task
// thread, floor 8g: 8 cores -> 8g (the config that measured healthy),
// 32 cores -> 24g. SPARK_DRIVER_MEM stays the explicit override.
def graftHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(c => scala.util.Try(c.trim.toInt).toOption).getOrElse(32)
  s"${math.max(8, (cpus * 3 + 3) / 4)}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
  // a multi-hundred-query run compiles thousands of generated classes;
  // the default 240m code cache fills mid-run and JIT flushing then
  // re-profiles hot codegen'd kernels inside timed regions (reserve is
  // address space only — committed code-cache memory grows on demand)
  "-XX:ReservedCodeCacheSize=512m",
)
