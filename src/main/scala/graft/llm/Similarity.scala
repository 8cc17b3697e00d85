package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star surface; absent from the reference — SURVEY §2.E).
  *
  * Scale design (100 TB of vectors):
  *  - [[bruteForceTopK]] is the exactness baseline: one projection
  *    (cosine, codegen'd array fold) + TakeOrderedAndProject — Spark
  *    keeps only k rows per partition then k at the driver; no shuffle
  *    of the full data, no collect of the scan;
  *  - [[SrpIndex]] is the scale path: vectors are bucketed once by
  *    signed-random-projection bits (a write-time partitioning key on a
  *    real deployment); a query probes its own bucket plus all 1-bit
  *    neighbors, turning a full scan into a ~(planes+1)/2^planes
  *    fraction scan with partition pruning when bucket is a partition
  *    column.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns — one codegen'd
    * expression, no UDF, no shuffle. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k by cosine against one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol),
        cosine(asDouble(col(vecCol)), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** All-pairs scores against one query (no limit) — the oracle-friendly
    * shape: every row, deterministic values. */
  def scoresForQuery(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], roundTo: Int = 6): DataFrame =
    df.select(col(idCol),
      round(cosine(asDouble(col(vecCol)), typedLit(query)), roundTo).as("cosine"))

  /** SRP-bucketed ANN index. */
  final case class SrpIndex(planes: Int = 12, seed: Long = 42L) {

    def planeVectors(dim: Int): Seq[Seq[Double]] = {
      val rng = new java.util.Random(seed)
      Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
    }

    def bucketExpr(vec: Column, dim: Int): Column = {
      val pv = planeVectors(dim)
      (0 until planes).map { i =>
        val dot = aggregate(zip_with(vec, typedLit(pv(i)), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

    /** Add the bucket column. On a real deployment, write the result
      * partitioned by `bucket` so probes prune partitions. */
    def build(df: DataFrame, vecCol: String): DataFrame = {
      val dim = df.select(size(col(vecCol))).head.getInt(0)
      df.withColumn("bucket", bucketExpr(asDouble(col(vecCol)), dim))
    }

    def bucketOf(query: Seq[Double]): Long = {
      val pv = planeVectors(query.length)
      (0 until planes).map { i =>
        val dot = pv(i).zip(query).map { case (x, y) => x * y }.sum
        if (dot >= 0) 1L << i else 0L
      }.sum
    }

    /** Multi-probe: own bucket + every 1-bit flip. */
    def probes(query: Seq[Double]): Seq[Long] = {
      val b = bucketOf(query)
      b +: (0 until planes).map(i => b ^ (1L << i))
    }

    /** ANN top-k: prune to probe buckets, exact cosine within. */
    def topK(indexed: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], k: Int): DataFrame =
      indexed.filter(col("bucket").isin(probes(query): _*))
        .select(col(idCol),
          cosine(asDouble(col(vecCol)), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
  }

  /** IVF (inverted-file) ANN index — the coarse-quantizer scale path
    * next to [[SrpIndex]]'s hyperplane hashing.
    *
    * Centroids are a deterministic sample (the `nlist` vectors with the
    * smallest xxhash64(id) — a seed-stable stand-in for a k-means train
    * step; swap in real k-means offline without changing the plan
    * shape). Every vector is assigned to its nearest centroid in ONE
    * codegen-friendly projection (argmin via `least(struct(dist, i))`),
    * so on a real deployment the table is written partitioned by
    * `ivf_cell` and a query scans only `nprobe`/nlist of the data via
    * partition pruning. */
  final case class IvfIndex(nlist: Int = 16) {

    def centroids(df: DataFrame, idCol: String, vecCol: String): Array[Seq[Double]] =
      df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
        .withColumn("_h", xxhash64(col("id")))
        .orderBy(col("_h")).limit(nlist)
        .select(col("v")).collect().map(_.getSeq[Double](0).toSeq)

    private def l2(vec: Column, c: Seq[Double]): Column =
      aggregate(zip_with(vec, typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)

    /** Nearest-centroid cell id as one projection. */
    def cellExpr(vec: Column, cents: Array[Seq[Double]]): Column = {
      val scored = cents.zipWithIndex.map { case (c, i) =>
        struct(l2(vec, c).as("d"), lit(i).as("i"))
      }
      least(scored: _*).getField("i")
    }

    /** Adds `ivf_cell`; write the result partitioned by it at scale. */
    def build(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val cents = centroids(df, idCol, vecCol)
      df.withColumn("ivf_cell", cellExpr(asDouble(col(vecCol)), cents))
    }

    def probeCells(cents: Array[Seq[Double]], query: Seq[Double],
                   nprobe: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq

    /** ANN top-k over the nprobe nearest cells, exact cosine within. */
    def topK(indexed: DataFrame, cents: Array[Seq[Double]], idCol: String,
             vecCol: String, query: Seq[Double], k: Int,
             nprobe: Int = 4): DataFrame =
      indexed.filter(col("ivf_cell").isin(probeCells(cents, query, nprobe): _*))
        .select(col(idCol),
          cosine(asDouble(col(vecCol)), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
  }
}
