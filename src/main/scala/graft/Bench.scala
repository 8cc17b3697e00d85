package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds. A failed query
  * is reported per-name in "failed" and flips the exit code — a broken
  * query can never silently "pass" the bench. A warmup query runs
  * untimed first so JVM/session warmup doesn't land on the first
  * alphabetical query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Logs.silenceBenignStreamingWarn()

    // warmup, untimed: one agg query plus a tiny sketch-pipeline run so
    // JVM/JIT warmup of the native expressions doesn't land on the first
    // alphabetical query that uses them
    try {
      SparkEntry.queries("q_agg_pricing_summary")(spark, sfDir).count()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(300)
      graft.llm.Dedup.minhashPairs(docs, "doc_id", "text", bands = 32).count()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val failed = results.filterNot(_._3).map(_._1)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
