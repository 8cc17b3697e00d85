package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-ramp diagnosis: counts LSH candidate pairs (Σ C(|bucket|,2))
  * and bucket-size distribution for the q_minhash_pairs corpus at a
  * given SF dir — the quantity that blows up when ambient (noise)
  * similarity meets a recall-biased banding curve. */
object RampDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.SketchExprs.{minhash_bands, shingleHashes}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val variants = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graft dup tail")).as("text"))
    val keys = docs.union(variants).select(col("doc_id"),
      posexplode(minhash_bands(shingleHashes(col("text"), 3), 64, 32))
        .as(Seq("band", "bucket")))
    val sizes = keys.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    val agg = sizes.agg(
      count(lit(1)).as("buckets"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"),
      sum(when(col("n") > 1000, col("n")).otherwise(0)).as("rows_in_hot")
    ).head
    println(s"[ramp-debug] dir=$dir buckets=${agg.get(0)} " +
      s"max_bucket=${agg.get(1)} cand_pairs=${agg.get(2)} " +
      s"rows_in_hot_buckets=${agg.get(3)}")
    spark.stop()
  }
}
