ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projet5sparsparkstreamingspark"
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
  // Pin the JVM default timezone too: specs build fixtures with
  // java.sql.Timestamp.valueOf (JVM zone) and compare against Spark
  // date_format (session zone, UTC) — on a host west of UTC-7 the two
  // would disagree about which day a timestamp lands in.
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Commit the WHOLE heap at JVM start, not lazily at first allocation:
  // this container's hypervisor backs anonymous pages at only
  // ~325 MB/s first-touch (measured r9; re-touch is 7x faster), so a
  // growing heap made the first 3M-row streaming batches pay ~100 s of
  // page-commit inside the measured window (the r8 driver artifact's
  // null streaming metric) and let G1 re-pay it after every uncommit.
  // Xms=Xmx stops G1 resizing; AlwaysPreTouch moves the one-time
  // commit cost to JVM startup, outside every measured phase.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
