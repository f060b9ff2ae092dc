ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kolibriespark"
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
// No "[success] Total time: ..." trailer after commands: the bench
// contract needs its one-line JSON to be the genuinely LAST stdout line
// (the driver's stdout-tail parser failed on the trailing sbt line two
// rounds running — VERDICT r11 item 1). Success/failure still reaches
// the driver through the exit code, which sbt sets regardless.
Global / showSuccess := false
Global / showTiming := false
// the two keys above are consumed by sbt's command layer, which the
// lintUnused check cannot see — exclude them from the startup warning
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
// Forked run output INHERITS sbt's stdout/stderr instead of being piped
// through the logger: the logger stamps every stdout line with an
// "[info] " prefix, which breaks a json.loads of the bench's one-line
// JSON (and buffers/reorders lines). With StdoutOutput the JSON line
// reaches the driver byte-identical to what the JVM printed.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
