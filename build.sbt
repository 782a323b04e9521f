ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "surgespark"
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
// The default `sbt test` is the fast core suite: multi-minute suites
// (operator smoke over every op, plan police, streaming restart
// drills) are annotated @org.scalatest.tags.Slow and excluded here so
// the run fits the driver's wall-clock budget (r14's full suite was
// cut off mid-run and recorded tests_ok=false with zero failures).
// The FULL set — which CI for this repo means running before any
// round-closing commit — is `sbt -Dgraft.slowTests=true test`.
Test / testOptions ++= (
  if (sys.props.get("graft.slowTests").contains("true")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "org.scalatest.tags.Slow")))
// Forked run/runMain output passes straight through to sbt's stdout,
// UNDECORATED: the default LoggedOutput prefixes every line with
// "[info] ", which breaks any downstream consumer that expects the
// bench's one-line JSON to be a parseable line (json.loads on a line
// starting with "[info] {" fails). Verified: no committed BENCH_r*.json
// ever had a non-null "parsed" field before this change.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
