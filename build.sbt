ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pypemanspark"
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
// Pass the forked program's stdout/stderr through VERBATIM instead of
// re-logging each line with an [info]/[error] prefix: graft.Bench and
// graft.Verify emit machine-readable JSON lines on stdout, and the
// prefixes have kept every round's bench artifact unparseable
// ("parsed": null in BENCH_r01..r08). With StdoutOutput the JSON line
// reaches the driver's capture as a raw `{"metric":...}` line, and the
// subprocess's log4j chatter stays on stderr instead of being folded
// into stdout as [error] lines.
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
// Dev/measurement aid: extra -D flags for the forked JVM (e.g.
// -Dspark.graft.graph.localSolveEdges=0 to bench/explain the distributed
// paths on the same build — Spark folds spark.* system properties into
// the session conf). Unset in driver runs, so the contract is unchanged.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
  .toSeq.flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
