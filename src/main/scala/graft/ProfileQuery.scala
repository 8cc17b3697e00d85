package graft

import org.apache.spark.sql.SparkSession

/** Stage-level wall-clock profiler for a driver query — the diagnostic
  * companion to [[Bench]]. `runMain graft.ProfileQuery q_name` runs the
  * query once to warm the JVM, then re-runs it under a stage listener
  * and prints per-stage wall time, task count, and summed task run time.
  * The gap between total wall and the stage-wall sum is driver-side cost
  * (planning, AQE re-optimization, checkpoint bookkeeping) — the r7
  * finding that made q_curation_incremental 5× faster (planning
  * dominated) and exposed AQE coalescing a 16-byte-row shuffle onto one
  * core under a CPU-heavy verify (q_dedup_connected).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <query_name> [query_name...]")
    graft.core.Logs.derbyHomeToScratch()
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

    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, sfDir).count() // warm: classloading + codegen
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()

      val stages =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, Long, String)]
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = s.stageInfo
          stages.add((info.stageId,
            info.completionTime.getOrElse(0L) -
              info.submissionTime.getOrElse(0L),
            info.numTasks, info.taskMetrics.executorRunTime,
            info.name.take(90)))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(l)
      var wallSum = 0L
      stages.forEach { case (id, ms, nt, rt, nm) =>
        wallSum += ms
        println(f"[stage] $name $id%5d wall=${ms}%6d ms tasks=$nt%4d " +
          f"taskRunTime=${rt}%6d ms  $nm")
      }
      println(f"[profile] $name total=${total}%.3f s stageWallSum=" +
        f"${wallSum / 1000.0}%.3f s stages=${stages.size} " +
        f"driverGap=${total - wallSum / 1000.0}%.3f s")
    }
    spark.stop()
  }
}
