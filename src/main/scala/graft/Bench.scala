package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds. A failed query
  * is reported per-name in "failed" and flips the exit code — a broken
  * query can never silently "pass" the bench. A warmup query runs
  * untimed first so JVM/session warmup doesn't land on the first
  * alphabetical query. Optional args restrict the run to the named
  * queries (repeats allowed — `q_x q_x q_x` times three back-to-back
  * runs in one warm JVM, the cheap way to separate noise from
  * regression).
  *
  * Timing discipline (round-6): each query runs `SPARK_GRAFT_BENCH_ITERS`
  * times (default 3). The FIRST run is reported separately as "cold"
  * (classloading + codegen + page-cache fill); "queries" and the total
  * carry the MEDIAN of the remaining warm runs. Round-5 showed the
  * single-shot numbers are noise-dominated in a 55-query JVM (q_sessions
  * 14.9s single-shot vs 0.33s isolated — GC pressure / ambient load, not
  * plan cost); the warm median is stable across reruns, so a real 2×
  * regression is visible instead of drowned. */
object Bench {

  /** Warm the engine spine (CSV write → sampled inference → Lua
    * transform → parquet), window + broadcast-join exec, and the Avro
    * connector on ~200 synthetic rows. First use of each path pays
    * classloading + whole-stage-codegen compilation that is fixed JVM
    * cost, not data cost (measured at sf0.1: q_engine_transfer 9.1s
    * cold vs 1.2s steady-state in the same JVM) — warming on synthetic
    * rows keeps the timed lines about the data, while never touching
    * the benchmark inputs themselves. */
  private def warmSharedPaths(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val base = "/root/repo/target/tmp/queries/warmup"
    val df = spark.range(200).select(
      col("id"), (col("id") % 7).as("k"), (col("id") * 1.5).as("v"),
      concat(lit("s"), col("id")).as("s"))
    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val cfg = graft.engine.JobConfig(
      source = s"$base/csv/*.csv",
      target = s"$base/out.parquet",
      transform = graft.engine.TransformSpec(
        inline = Some("v2=row.v * 100; s2=string.lower(row.s)")),
      truncate = true)
    new graft.engine.TransferEngine(cfg).execute(spark)
    spark.read.parquet(s"$base/out.parquet").count()
    df.withColumn("r",
        row_number().over(Window.partitionBy("k").orderBy(col("v").desc)))
      .join(broadcast(df.groupBy("k").agg(avg("v").as("a"))), "k")
      .count()
    graft.sources.AvroConnector.write(df, s"$base/avro")
    graft.sources.AvroConnector.read(spark, s"$base/avro").count()
  }

  def main(args: Array[String]): Unit = {
    graft.core.Logs.derbyHomeToScratch()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
      warmSharedPaths(spark)
    } catch { case _: Throwable => () }

    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else args.toSeq.map(n => n -> SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")))
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // Settle the JVM between queries: several operators eagerly
    // localCheckpoint (dedup fixpoint, observed pipeline) and those
    // blocks are reclaimed only when the context cleaner notices the
    // frame is garbage — in a 58-query run the backlog piles onto later
    // queries' warm runs (q_dedup_connected measured 3.9x its isolated
    // time from exactly this). Dropping persistent RDDs + one GC per
    // query bounds the cross-query contamination.
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // (name, warmMedianSec, coldSec, ok)
    val results = selected.map { case (name, fn) =>
      settle()
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(e.getMessage) }
      }
      once() match {
        case Left(msg) =>
          System.err.println(s"[bench] $name FAILED: $msg")
          (name, 0.0, 0.0, false)
        case Right(cold) =>
          // settle between iterations too: a query that checkpoints
          // (the dedup fixpoint) would otherwise feed its run-N blocks
          // into run N+1's timing — the same contamination mechanism,
          // one level down
          val warm = (2 to iters).map { _ => settle(); once() }
          warm.collectFirst { case Left(msg) => msg } match {
            case Some(msg) =>
              System.err.println(s"[bench] $name FAILED (warm rerun): $msg")
              (name, 0.0, cold, false)
            case None =>
              val ws = warm.collect { case Right(t) => t }.sorted
              // median of warm runs; with no warm runs (iters=1) fall back to cold
              val med =
                if (ws.isEmpty) cold
                else if (ws.size % 2 == 1) ws(ws.size / 2)
                else (ws(ws.size / 2 - 1) + ws(ws.size / 2)) / 2.0
              (name, med, cold, true)
          }
      }
    }
    // repeated names (diagnostic mode) get #2, #3… suffixes so the JSON
    // object never carries duplicate keys; "failed" uses the SAME
    // suffixed names so its entries always match keys in "queries"
    val keyed = results.foldLeft((Map.empty[String, Int], Vector.empty[(String, Double, Double, Boolean)])) {
      case ((seen, acc), (k, v, c, ok)) =>
        val n = seen.getOrElse(k, 0) + 1
        (seen.updated(k, n), acc :+ (((if (n == 1) k else s"$k#$n"), v, c, ok)))
    }._2
    val failed = keyed.filterNot(_._4).map(_._1)
    val qs = keyed.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cs = keyed.map { case (k, _, c, _) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val totalCold = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"queries":$qs,"cold":$cs,"total_cold":$totalCold,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
