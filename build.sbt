ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xesmfspark"
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
// r16 verdict #2 (driver bench contract, blind since r12): the driver
// parses the LAST stdout line of `sbt "runMain graft.Bench"` as the
// one-line JSON contract, but under the default LoggedOutput strategy
// sbt prefixes every forked-program line with "[info] " and appends its
// own "[success] Total time ..." epilogue AFTER the program's output —
// so the driver's parse failed in every round (BENCH_r01..r16 all carry
// `parsed: null`). StdoutOutput passes the forked JVM's stdout through
// verbatim; showSuccess=false drops the epilogue so the bench's
// contract line really is the last stdout line. Exit codes (what
// VERIFY's compile_ok/tests_ok read) are unaffected.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
// SPARK_DRIVER_MEM is honored up to a 31g CAP: this workload measured
// strictly FASTER at small heaps on the same binary (PLANS.md: the full
// 125-query sf0.1 contract runs comfortably at 8g in ~107 s vs ~123 s
// at 89-96g with 2-4x per-query swings; a 100M-row md5 projection read
// 3.9 s at 8g vs 154 s at 64g), and past ~32g the JVM additionally
// loses compressed oops. 31g keeps 4x headroom over the proven 8g
// requirement. SPARK_GRAFT_HEAP_UNCAPPED=1 restores the raw value.
def capHeap(v: String): String = {
  val uncapped = sys.env.get("SPARK_GRAFT_HEAP_UNCAPPED").contains("1")
  val mb: Option[Double] = try {
    Some(v.trim.toLowerCase.stripSuffix("b") match { // tolerate "96gb"/"96g"
      case s if s.endsWith("g") => s.dropRight(1).toDouble * 1024
      case s if s.endsWith("m") => s.dropRight(1).toDouble
      case s if s.endsWith("k") => s.dropRight(1).toDouble / 1024
      case s => s.toDouble / (1024 * 1024) // bytes
    })
  } catch { case _: NumberFormatException => None }
  // Always emit a canonical "<N>m": inputs like "8gb" parse here but are
  // NOT valid -Xmx flags, and an unparseable/nonpositive value must fall
  // back to the proven 8g default rather than abort JVM startup.
  mb match {
    case None                                      => "8192m"
    case Some(m) if m < 1                          => "8192m"
    case Some(m) if !uncapped && m > 31 * 1024     => "31744m"
    case Some(m)                                   => s"${m.toLong}m"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${capHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
