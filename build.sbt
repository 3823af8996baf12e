ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fineoreaderatorspark"
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
// Pass the forked run's stdout through UNPREFIXED: sbt's default
// LoggedOutput strategy prepends "[info] " to every stdout line, which
// breaks any consumer that matches a bare JSON line (the bench's
// {"metric":...} headline was never machine-parseable through sbt —
// every recorded BENCH_r*.json shows "parsed": null for exactly this
// reason, r01 included, where the line was fully visible in the tail).
Compile / run / outputStrategy := Some(sbt.OutputStrategy.StdoutOutput)
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
  // The query battery generates a lot of whole-stage-codegen classes; with
  // the JVM default (240m) the code cache fills mid-battery, HotSpot stops
  // JIT-compiling, and the next big generated class (the minhash signature
  // pipeline) runs interpreted — observed as a 10-30x slowdown on exactly
  // one query. Headroom + flushing keeps the JIT on.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
