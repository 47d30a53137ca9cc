ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pagilaetlairflow_assignmentspark"
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
// Pass the forked app's stdout through VERBATIM instead of via sbt's
// logger: the bench/verify harness greps stdout for a bare JSON line,
// and the default LoggedOutput strategy prefixes every line with
// "[info] " (round-1 bench JSON was unparseable because of it).
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
  "-Duser.timezone=UTC",
  // 16g default: local[32] runs driver+executors in ONE heap, and the
  // ~100-query resident bench holds codegen/broadcast/checkpoint state
  // for many plans at once — 8g left it GC-bound on the tail queries.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // A ~100-query run JIT-compiles thousands of generated classes; the
  // default code cache and compiler-thread count leave later queries'
  // hot loops stuck interpreted in the C2 queue (measured: random
  // queries inflating 2.3 s → 18.3 s with flat GC). Headroom for the
  // code cache + a wider compile queue cut the full-bench headline
  // 161 s → 122 s on this box. A/B'd against TieredStopAtLevel=1
  // (predictable but ~1.5× slower everywhere, 180 s).
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:CICompilerCount=12",
) ++
  // Extra JVM flags for experiments (e.g. JIT tuning A/Bs):
  //   SPARK_GRAFT_JAVA_OPTS="-XX:TieredStopAtLevel=1" sbt "runMain graft.Bench"
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
