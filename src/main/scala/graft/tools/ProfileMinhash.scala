package graft.tools

import graft.functions.SketchExprs._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val variants = docs0.filter(pmod(col("doc_id"), lit(4)) === 1)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graft dup tail")).as("text"))
    val corpus = docs0.union(variants)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[step] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    corpus.count() // warm
    time("corpus.count")(corpus.count())
    val docs = corpus.select(col("doc_id").as("id"),
      shingleHashes(col("text"), 3).as("shingles"))
    time("shingles.count")(docs.count())
    time("shingles explode count")(docs.select(explode(col("shingles"))).count())
    val keys = docs.select(col("id"),
      posexplode(minhash_bands(col("shingles"), 64, 32)).as(Seq("band", "bucket")))
    time("keys.count")(keys.count())
    val sizes = keys.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1 && col("_n") <= 10000)
    val kept = keys.join(sizes, Seq("band", "bucket")).drop("_n")
    time("kept.count")(kept.count())
    val cand = kept.as("a")
      .join(kept.select(col("id").as("id_b"), col("band"), col("bucket")).as("b"),
        Seq("band", "bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b")).distinct()
    time("cand.count")(cand.count())
    val verified = cand
      .join(docs.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= 0.5)
    time("verified.count")(verified.count())
    spark.stop()
  }
}
