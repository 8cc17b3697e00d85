package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Bloom

/** Bloom engine ramp: build a 1%-FP filter over n keys, probe 2n keys
  * (n members + n novel), FORCING the probe column through a filter +
  * count so nothing prunes (the shared bench times queries under
  * `count()`, which column-prunes pure projections — this harness
  * exists to measure the build aggregation and the per-row bit test
  * for real). Asserts zero false negatives on every run and reports
  * the observed FP rate against the 1% sizing.
  *
  * Usage: runMain graft.tools.BloomRampBench [nKeys ...]
  */
object BloomRampBench {

  def main(args: Array[String]): Unit = {
    graft.core.Logs.derbyHomeToScratch()
    val ns: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(1000000L, 10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    ns.foreach { n =>
      val (m, k) = Bloom.sizeFor(n, 0.01)
      val ref = spark.range(n).select(
        concat(lit("member key "), col("id")).as("key"))
      val t0 = System.nanoTime()
      val bloomDf = Bloom.build(ref, col("key"), m, k)
      bloomDf.cache().count() // materialize the blob once
      val buildSec = (System.nanoTime() - t0) / 1e9
      // 2n probes: ids [0, n) are members, [n, 2n) are novel
      val probes = spark.range(2 * n).select(col("id"),
        concat(lit("member key "), when(col("id") < n, col("id"))
          .otherwise(col("id") - lit(2) * n)).as("key"))
      val t1 = System.nanoTime()
      val flagged = Bloom.probe(probes, bloomDf, col("key"), m, k)
        .filter(col("might_seen")).count()
      val probeSec = (System.nanoTime() - t1) / 1e9
      require(flagged >= n,
        s"FALSE NEGATIVES: only $flagged of $n members flagged")
      val fpRate = (flagged - n).toDouble / n
      println(f"""{"metric":"bloom_ramp","n":$n,"m_bits":$m,"k":$k,""" +
        f""""build_sec":$buildSec%.3f,"probe_sec":$probeSec%.3f,""" +
        f""""probes":${2 * n},"fp_rate":$fpRate%.5f}""")
      bloomDf.unpersist()
    }
    spark.stop()
  }
}
