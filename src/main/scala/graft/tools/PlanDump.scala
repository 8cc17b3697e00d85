package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 measurement tooling (guide §1.2 / §7.2): dump
  * `.explain("formatted")` for named driver queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage:
  *
  *   runMain graft.tools.PlanDump <outDir> <suffix> [query...]
  *
  * writes `<outDir>/<query>_<suffix>.txt` for each named query (all
  * queries when none are named). Plans are captured WITHOUT executing
  * the query (initial plan, `AdaptiveSparkPlan isFinalPlan=false`),
  * which is the comparable shape across code versions — AQE's runtime
  * re-optimization depends on measured sizes that differ per SF. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query...]")
    graft.core.Logs.derbyHomeToScratch()
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan =
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable =>
          s"PLAN CAPTURE FAILED: ${e.getMessage}"
        }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $name -> ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
