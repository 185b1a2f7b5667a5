ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusiondynamicfilterspark"
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
// Forked run output goes straight to stdout without sbt's "[info] " prefix,
// so Bench's single JSON metric line stays machine-parseable.
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
  // local[32] runs 32 concurrent tasks inside ONE JVM (driver + executor
  // share the heap); at 8g the dedup/text families spent 70-150 s of
  // task-attributed GC per bench pass (r21 baseline artifact) and the worst
  // reps burned 40-130 s of run_ms in collection stalls. 32g on the 128 GiB
  // host cut the family's GC to ~0 and its wall time 2-6x (r21 A/B:
  // q_dedup_ngram_planted 10.2→0.97 s med, q_dedup_semantic_drop 10.8→0.98,
  // q_profile_hot_approx 5.8→0.64). Parameterized: the driver can still pin
  // SPARK_DRIVER_MEM; at cluster scale executor memory is sized per
  // executor, not by this local-run default.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
