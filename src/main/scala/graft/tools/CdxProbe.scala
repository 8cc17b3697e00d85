package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{CdxIndex, WarcSource}

/** CDX same-JVM rep diagnosis (round-16): the full `q_cdx_lookup` gate
  * showed warm reps SLOWER than cold (12 s → 38 s at 100×) on both the
  * r15 and r16 trees, while `q_cdx_host` (same archive write, prefix
  * fetch instead of broadcast-join lookup) holds steady. This probe
  * separates the legs: one archive write, then N timed iterations of
  * (a) the CDX sidecar scan alone, (b) the broadcast-join lookup, and
  * (c) the prefix fetch — whichever leg degrades across same-JVM reps
  * is the one carrying the accumulated state.
  *
  * Usage: runMain graft.tools.CdxProbe [sfDir] [reps]
  */
object CdxProbe {
  def main(args: Array[String]): Unit = {
    graft.core.Logs.derbyHomeToScratch()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "/root/repo/target/tmp/queries/cdx_probe"
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cdx-probe] $what%-14s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(
      concat(lit("http://corpus.test/doc/"), col("doc_id")).as("uri"),
      col("text"))
    t("write")(WarcSource.write(docs.repartition(col("uri")), out,
      "uri", "text", cdxIndex = true))
    val wanted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5)) === 2)
      .select(concat(lit("http://corpus.test/doc/"), col("doc_id"))
        .as("uri"))
    (1 to reps).foreach { i =>
      t(s"scan#$i")(CdxIndex.read(spark, out).count())
      t(s"lookup#$i")(CdxIndex.lookup(spark, out, wanted).count())
      t(s"fetchall#$i")(CdxIndex.fetch(CdxIndex.read(spark, out)
        .filter(col("surt").startsWith("test,corpus)"))).count())
    }
    spark.stop()
  }
}
