ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "healthdatatransformationspark"
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
// Pass forked program output straight through (no "[info] " logger
// prefix): the Bench/Verify contract is a bare JSON line on stdout,
// and the wrapped form defeats line-oriented JSON parsing downstream.
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
  // 24g default: at -Xmx8g the full 188-query local[32] bench suite
  // runs ~6% slower from GC pressure alone (measured r9: 217.6 s at
  // 8g vs 205.7 s at 24g, same tree) and spiky queries degrade 2x
  // (dd11 6.2->3.7 s). The box has 128 GiB; 24g is still conservative.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // JIT code cache (r16): the JDK default (240 MB) is sized for one
  // application, not a 191-query suite where every query contributes
  // whole-stage-codegen classes per pass. A full cache flips HotSpot
  // into flush/recompile churn (or disables compilation outright) and
  // CPU-dense kernels silently run partially interpreted — the
  // late-suite 1.6–6x per-query degradation previously triaged as
  // "host ambient mode" (NOTES_r9). Parameterised like the heap; 1g is
  // plain VM provisioning, not a local[32] tuning constant.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
)
