package graft.llm

import graft.functions.VectorExprs
import graft.functions.VectorExprs.{cosine_sim, nearest_centroid, srp_bits}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star surface; absent from the reference — SURVEY §2.E).
  *
  * Scale design (100 TB of vectors):
  *  - [[bruteForceTopK]] is the exactness baseline: one projection
  *    (native one-pass [[VectorExprs.CosineSim]]) + TakeOrderedAndProject
  *    — Spark keeps only k rows per partition then k at the driver; no
  *    shuffle of the full data, no collect of the scan;
  *  - [[SrpIndex]] is the scale path: vectors are bucketed once by
  *    signed-random-projection bits (a write-time partitioning key on a
  *    real deployment); a query probes its own bucket plus all 1-bit
  *    neighbors, turning a full scan into a ~(planes+1)/2^planes
  *    fraction scan with partition pruning when bucket is a partition
  *    column;
  *  - [[IvfIndex]] is the coarse-quantizer alternative: k-means cells
  *    trained with a few Lloyd rounds of DataFrame aggregations, then
  *    one nearest-centroid projection per row.
  *
  * Every hot projection here is a native Catalyst expression
  * (graft.functions.VectorExprs) — one JIT-compiled pass per row inside
  * whole-stage codegen, never per-element interpreted HOF lambdas.
  */
object Similarity {

  /** Cosine similarity of two numeric-array columns — one native
    * codegen'd pass, no UDF, no shuffle. Mixed float/double inputs fine. */
  def cosine(a: Column, b: Column): Column = cosine_sim(a, b)

  /** Exact top-k by cosine against one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol),
        cosine_sim(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** All-pairs scores against one query (no limit) — the oracle-friendly
    * shape: every row, deterministic values. */
  def scoresForQuery(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], roundTo: Int = 6): DataFrame =
    df.select(col(idCol),
      round(cosine_sim(col(vecCol), typedLit(query)), roundTo).as("cosine"))

  /** SRP-bucketed ANN index. */
  final case class SrpIndex(planes: Int = 12, seed: Long = 42L) {

    /** Plane matrix shared with the executor-side expression — both call
      * [[VectorExprs.srpPlanes]] so driver query-bucketing and row
      * bucketing can never disagree. */
    def planeVectors(dim: Int): Seq[Seq[Double]] =
      VectorExprs.srpPlanes(planes, dim, seed).map(_.toSeq).toSeq

    /** One-pass native SRP bucket projection; dim is read from each
      * vector at eval time (no driver dim-probe job). */
    def bucketExpr(vec: Column): Column = srp_bits(vec, planes, seed)

    /** Add the bucket column. On a real deployment, write the result
      * partitioned by `bucket` so probes prune partitions. */
    def build(df: DataFrame, vecCol: String): DataFrame =
      df.withColumn("bucket", bucketExpr(col(vecCol)))

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
          cosine_sim(col(vecCol), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
  }

  /** IVF (inverted-file) ANN index — the coarse-quantizer scale path
    * next to [[SrpIndex]]'s hyperplane hashing.
    *
    * Centroids = deterministic seeds (the `nlist` vectors with the
    * smallest xxhash64(id)) refined by `kmeansIters` Lloyd rounds run as
    * DataFrame aggregations: assign via the native nearest-centroid
    * projection, recompute as per-dimension means. Raw vectors never
    * shuffle during training — partial aggregation reduces the exploded
    * (cell, pos, x) triples map-side, so only nlist×dim partials per
    * partition cross the wire. Every vector is then assigned to its
    * cell in ONE codegen projection; on a real deployment the table is
    * written partitioned by `ivf_cell` and a query scans only
    * `nprobe`/nlist of the data via partition pruning. */
  final case class IvfIndex(nlist: Int = 16, kmeansIters: Int = 3) {

    /** Deterministic k-means seeds: smallest-xxhash64(id) sample. */
    def initialCentroids(df: DataFrame, idCol: String,
                         vecCol: String): Array[Seq[Double]] =
      df.select(col(idCol).as("id"),
          transform(col(vecCol), _.cast("double")).as("v"))
        .withColumn("_h", xxhash64(col("id")))
        .orderBy(col("_h")).limit(nlist)
        .select(col("v")).collect().map(_.getSeq[Double](0).toSeq)

    /** Lloyd-refined centroids (deterministic seeds + `kmeansIters`
      * assignment/mean rounds). Cells that lose all members keep their
      * previous centroid. */
    def centroids(df: DataFrame, idCol: String, vecCol: String): Array[Seq[Double]] = {
      var cents = initialCentroids(df, idCol, vecCol)
      var it = 0
      // an empty corpus seeds no centroids — skip refinement (the
      // nearest-centroid expression requires at least one centroid at
      // construction, and there is nothing to refine anyway)
      while (cents.nonEmpty && it < kmeansIters) {
        val means = df
          .select(nearest_centroid(col(vecCol), cents.toIndexedSeq).as("cell"),
            posexplode(col(vecCol)).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg(avg(col("x").cast("double")).as("m"))
          .collect()
        val next = cents.map(_.toArray)
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        cents = next.map(_.toSeq)
        it += 1
      }
      cents
    }

    /** Nearest-centroid cell id as one native one-pass projection. */
    def cellExpr(vec: Column, cents: Array[Seq[Double]]): Column =
      nearest_centroid(vec, cents.toIndexedSeq)

    /** Adds `ivf_cell`; write the result partitioned by it at scale. */
    def build(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      build(df, vecCol, centroids(df, idCol, vecCol))

    /** [[build]] with pre-trained centroids (train once, assign often). */
    def build(df: DataFrame, vecCol: String,
              cents: Array[Seq[Double]]): DataFrame =
      df.withColumn("ivf_cell", cellExpr(col(vecCol), cents))

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
          cosine_sim(col(vecCol), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
  }

  /** Product quantization (Jégou, Douze & Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search") — the embedding
    * COMPRESSION leg of ANN at 100 TB: each d-dim vector splits into
    * `m` contiguous sub-blocks, each block quantizes to its nearest of
    * `ksub` per-block centroids, and the vector is stored as m small
    * codes (m bytes at ksub ≤ 256) instead of d floats — a 100-500×
    * storage cut that lets the candidate scan stay in memory. Query
    * scoring is ADC (asymmetric distance computation): the QUERY stays
    * exact, a per-block lookup table of squared-L2 distances to every
    * centroid is built once driver-side (m × ksub doubles, bounded),
    * and each stored vector scores as m table lookups — no float
    * vector is ever touched at scan time.
    *
    * Scale shape: codebook training is per-block Lloyd iterations over
    * SLICED vectors (the slice is a codegen'd projection — raw vectors
    * never shuffle; the per-block mean aggregation reduces map-side,
    * exactly [[IvfIndex.centroids]]' shape, m times on dsub-wide
    * slices); encoding is ONE projection of m native
    * [[graft.functions.VectorExprs]] nearest-centroid expressions;
    * ADC scoring is a pure per-row projection (array literal lookups
    * + an m-term sum, all codegen'd) feeding TakeOrderedAndProject —
    * no shuffle anywhere but the training aggregations.
    *
    * Determinism: seeds are the first `ksub` vectors by id ASC
    * (SQL-replayable, unlike a hash sample); empty cells keep their
    * previous centroid; [[graft.functions.VectorExprs.NearestCentroid]]
    * breaks distance ties to the smallest index. With
    * `kmeansIters = 0` the codebook IS the seed set — the
    * oracle-gateable configuration (every stage replays in SQL); real
    * deployments train with iters > 0 (recall unit-pinned). */
  final case class PqIndex(m: Int = 4, ksub: Int = 16,
                           kmeansIters: Int = 3) {
    require(m >= 1 && ksub >= 1, s"m=$m ksub=$ksub must be >= 1")

    private def blockCol(vecCol: String, dsub: Int, b: Int): Column =
      transform(slice(col(vecCol), b * dsub + 1, dsub), _.cast("double"))

    /** Per-block codebooks: m × ksub × dsub. `dim` must be divisible
      * by m (pad upstream otherwise — silent ragged blocks would
      * misalign every code). */
    def codebooks(df: DataFrame, idCol: String, vecCol: String,
                  dim: Int): Array[Array[Seq[Double]]] = {
      require(dim % m == 0, s"dim=$dim not divisible by m=$m — pad the " +
        "vectors or change m")
      val dsub = dim / m
      // id-ASC seeds, one bounded collect of ksub full vectors
      val seeds = df
        .select(col(idCol).as("id"),
          transform(col(vecCol), _.cast("double")).as("v"))
        .orderBy(col("id")).limit(ksub)
        .select(col("v")).collect().map(_.getSeq[Double](0).toSeq)
      require(seeds.nonEmpty,
        "PqIndex.codebooks: empty corpus — nothing to seed from")
      require(seeds.forall(_.size == dim),
        s"PqIndex.codebooks: vectors shorter than dim=$dim exist")
      // corpus-wide guard (one cheap min/max over array SIZES, no
      // vector math): a LONGER vector would otherwise be silently
      // truncated to its first dim components by the block slice
      // through training, encoding and ADC scoring; shorter ones fail
      // later in NearestCentroid — make both loud here instead
      val szRow = df.agg(min(size(col(vecCol))).as("mn"),
        max(size(col(vecCol))).as("mx")).head()
      require(szRow.getInt(0) == dim && szRow.getInt(1) == dim,
        s"PqIndex.codebooks: corpus vector sizes span " +
          s"[${szRow.getInt(0)}, ${szRow.getInt(1)}] but dim=$dim — " +
          "every vector must be exactly dim components")
      Array.tabulate(m) { b =>
        var cents: Array[Seq[Double]] =
          seeds.map(_.slice(b * dsub, (b + 1) * dsub))
        var it = 0
        while (cents.nonEmpty && it < kmeansIters) {
          val means = df
            .select(nearest_centroid(blockCol(vecCol, dsub, b),
                cents.toIndexedSeq).as("cell"),
              posexplode(blockCol(vecCol, dsub, b)).as(Seq("pos", "x")))
            .groupBy(col("cell"), col("pos"))
            .agg(avg(col("x")).as("mc"))
            .collect()
          val next = cents.map(_.toArray)
          means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
          cents = next.map(_.toSeq)
          it += 1
        }
        cents
      }
    }

    /** Adds `pq_code` (array<int>, length m) — the stored form. */
    def encode(df: DataFrame, vecCol: String,
               books: Array[Array[Seq[Double]]]): DataFrame = {
      val dsub = books(0)(0).size
      df.withColumn("pq_code", array(books.indices.map(b =>
        nearest_centroid(blockCol(vecCol, dsub, b),
          books(b).toIndexedSeq)): _*))
    }

    /** ADC lookup table for one query: lut(b)(j) = squared L2 from the
      * query's block b to centroid j. Driver-side, m × ksub doubles. */
    def adcTable(books: Array[Array[Seq[Double]]],
                 query: Seq[Double]): Array[Array[Double]] = {
      val dsub = books(0)(0).size
      Array.tabulate(books.length) { b =>
        val qb = query.slice(b * dsub, (b + 1) * dsub)
        books(b).map(c =>
          c.zip(qb).map { case (a, q) => (a - q) * (a - q) }.sum).toArray
      }
    }

    /** Approximate top-k by ADC distance (asc, ties to smaller id):
      * per-row it is m array-literal lookups + a sum — codegen'd, no
      * vector math at scan time. */
    def topK(encoded: DataFrame, idCol: String,
             books: Array[Array[Seq[Double]]], query: Seq[Double],
             k: Int): DataFrame = {
      val lut = adcTable(books, query)
      val dist = lut.indices.map(b =>
        element_at(typedLit(lut(b).toSeq),
          element_at(col("pq_code"), b + 1) + 1)).reduce(_ + _)
      encoded.select(col(idCol), dist.as("adc_dist"))
        .orderBy(col("adc_dist").asc, col(idCol))
        .limit(k)
    }
  }

  /** IVF-PQ with exact rerank — the production ANN recipe (the FAISS
    * `IVFx,PQy` index, Jégou 2011 §V): the IVF coarse quantizer PRUNES
    * the scan to `nprobe` cells (partition pruning when the table is
    * written partitioned by `ivf_cell`), PQ codes give a cheap ADC
    * shortlist of `rerank` candidates WITHIN the probed cells (m table
    * lookups per row — no float vector touched), and only the
    * shortlist pays an exact-cosine pass against the raw vectors.
    * Cost shape at 100 TB: scan nprobe/nlist of the corpus reading
    * only (id, pq_code) columns, then `rerank` full-vector rows — the
    * raw embedding column is touched for a few hundred rows total.
    *
    * With `nprobe = nlist` and `rerank >= corpus`, output equals
    * [[bruteForceTopK]] exactly — the oracle-gateable configuration;
    * production recall at smaller knobs is unit-pinned. */
  object IvfPq {

    /** `indexed` must carry `ivf_cell` ([[IvfIndex.build]]), `pq_code`
      * ([[PqIndex.encode]]), the id and the raw vector columns.
      * Returns (id, cosine) — top-k exact cosines of the reranked
      * shortlist, desc, ties to smaller id. */
    def topK(indexed: DataFrame, cents: Array[Seq[Double]],
             pq: PqIndex, books: Array[Array[Seq[Double]]],
             idCol: String, vecCol: String, query: Seq[Double], k: Int,
             nprobe: Int = 4, rerank: Int = 100): DataFrame = {
      require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
      val probed = indexed.filter(col("ivf_cell").isin(
        IvfIndex(nlist = cents.length).probeCells(cents, query, nprobe): _*))
      val shortlist = pq.topK(probed, idCol, books, query, rerank)
        .select(col(idCol))
      indexed.join(shortlist, Seq(idCol), "left_semi")
        .select(col(idCol),
          cosine_sim(col(vecCol), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
    }
  }
}
