ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kinesisdatacounterspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Optional REAL AWS SDK jars for RealSdkShapesSpec (which self-skips when
// absent — they are absent in this zero-egress container): drop
// software.amazon.awssdk kinesis+core jars into lib/aws-sdk/ or point
// GRAFT_AWS_SDK_JARS at a directory. No resolution happens — unmanaged.
Test / unmanagedJars ++= {
  val dir = file(sys.env.getOrElse("GRAFT_AWS_SDK_JARS", "lib/aws-sdk"))
  if (dir.isDirectory) (dir ** "*.jar").classpath else Seq.empty
}
Test / fork := true
run / fork := true
// Forked run output passes through UNPREFIXED: sbt's default LoggedOutput
// prepends "[info] " to every stdout line, which breaks machine parsing of
// Bench's single JSON result line (round 1's bench JSON failed to parse).
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
  // Pin the heap: a lazily-growing multi-GB heap page-faults its way up
  // (kernel time, 3-10x run-to-run swings on query batches); committing it
  // up front moves that cost to startup, outside any query timing.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  // Many sequential queries in one JVM generate thousands of Janino classes;
  // the default 240 MB code cache silently sweeps hot JIT'd code and later
  // queries degrade 3-10x. Headroom keeps steady-state performance.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // 32 executor threads + the default ~23 parallel GC workers oversubscribe
  // a 32-vCPU host; bounding GC parallelism keeps task threads scheduled.
  "-XX:ParallelGCThreads=8",
  "-XX:ConcGCThreads=2",
)
