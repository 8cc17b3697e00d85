package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: times one query N times and prints the
  * formatted plan so shuffle/codegen shapes can be audited. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_minhash_pairs")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    graft.SparkEntry.queries("q_agg_pricing_summary")(spark, sfDir).count() // warmup
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    if (sys.env.get("PROFILE_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
