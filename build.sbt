ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "slowlog2clickhousespark"
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
// Pass the forked process's stdout straight through instead of logging it
// via sbt (which prefixes every line with "[info] " — that prefix made the
// driver's json.loads of Bench's contract line fail every round).
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
)
// Spark suites share one local SparkContext (and one test touches the
// shared Hadoop conf); run suites sequentially.
Test / parallelExecution := false
// DuckDB JDBC jar from the pre-warmed local cache (test-only stand-in for
// the reference's ClickHouse sink; SURVEY.md M3). Not a new dependency
// resolution — a local unmanaged jar, located by glob so no cache-layout
// path is hardcoded. Exactly ONE jar (the newest by numeric version) is
// added: two cached versions on the classpath would make the loaded
// engine version classpath-order dependent, and a lexicographic sort
// would rank 0.9 above 0.10.
Test / unmanagedJars ++= {
  // version components compared as a sequence (not packed base-1000,
  // which a date-stamped component like 20240101 would overflow)
  import scala.math.Ordering.Implicits._
  (file(sys.env.getOrElse("COURSIER_CACHE", "/root/.cache/coursier")) **
    "duckdb_jdbc-*.jar").get
    .sortBy(f => "\\d+".r.findAllIn(f.getName).map(_.toLong).toSeq.padTo(6, 0L))
    .lastOption.toSeq.map(Attributed.blank(_))
}
