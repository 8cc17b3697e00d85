ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tinyetlspark"
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
// Forked `run` output passes through to stdout RAW — no `[info] ` logger
// prefix. The driver tail-captures stdout and json-parses the bench
// line; a logger prefix makes every line unparseable (BENCH_r07
// "parsed": null despite the summary line being present in the tail).
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
// Default heap sized to the box (guide §5 / SCALING.md round-10
// finding 1: memory PER CORE is the knob — 2 GiB/core restored the
// linear curve where 256 MiB/core fell off a 2.6× cliff; the r18
// constant 24g measured −15.8% on the full sf0.1 bench vs 8g). Round
// 19 derives the default from PHYSICAL RAM instead of hard-coding a
// ≥32 GiB host: round(RAM GiB · 3/16), floor 8 GiB — still exactly
// 24g on this 128 GiB box (identical bench numbers), and a small dev
// machine gets a heap it can actually fork. A cluster deployment
// sizes executor memory per core explicitly; SPARK_DRIVER_MEM stays
// the override for ramp runs (SCALING.md uses 64g for 10×–100×).
val defaultHeap: String = {
  val gib: Option[Double] =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toDouble / (1024.0 * 1024.0) }
    catch { case _: Throwable => None }
  val g = gib.map(x => math.max(8L, math.round(x * 3.0 / 16.0))).getOrElse(8L)
  s"${g}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
