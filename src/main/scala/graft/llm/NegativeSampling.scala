package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive training pairs —
  * the data-side half of embedding/retrieval training (SimCLR/DPR/
  * sentence-transformer recipes): every (query, positive) pair gets k
  * corpus negatives, drawn uniformly and REPRODUCIBLY (same corpus +
  * seed ⇒ same negatives on any cluster, any partitioning — the
  * property `rand()`-based sampling loses the moment a partition
  * count changes).
  *
  * Mechanics: candidates get a dense 0-based rank in id order via
  * [[graft.operators.Distributions.cumulativeByKey]] — the
  * range-partitioned parallel prefix sum, NOT a single-reducer
  * `row_number` window (rank a corpus once per epoch; the cost
  * amortizes over every batch drawn from it). Pair (q, j) then
  * targets rank `portableBucket(q·31 + j + seed) mod n` — exact
  * integer arithmetic any SQL engine replays — and a plain shuffled
  * equi-join on the rank fetches the candidate. Ids are numeric (the
  * [[Sampling.portableBucket]] contract); string-keyed corpora
  * attach a numeric surrogate first.
  *
  * Accidental hits: a drawn negative that EQUALS the pair's positive
  * (or the query itself) is dropped rather than resampled — per-pair
  * loss probability ≈ 2k/n, negligible at corpus scale, and the drop
  * keeps the operator a two-join plan instead of an unbounded
  * resample loop. Callers needing exactly-k on small corpora raise k
  * and trim. The modulus fold of the 10^6-bucket hash adds bias
  * O(n/10^6) per rank — draw-quality, not determinism — and because
  * the hash's range IS [[Sampling.Buckets]] = 10^6, a corpus with
  * n > 10^6 distinct candidates could never draw ranks >= 10^6; the
  * operator refuses such corpora loudly rather than silently skewing
  * the draw (shard the candidate table and union per-shard draws, or
  * extend this operator with a second independent draw composing
  * `portableBucket(x)·Buckets + portableBucket(x·37+1)` before the
  * modulus, when a >10^6-candidate single draw is actually needed).
  * NULL candidate ids are dropped before ranking — a null would
  * otherwise occupy rank 0 (nulls-first in id order), shift every
  * real candidate's documented rank, and silently vanish from any
  * pair that draws it (the accidental-hit filters are non-null-safe
  * by design).
  *
  * Scale shape: one count action (the n in the modulus), one range
  * exchange for the rank, one hash join probes-to-candidates; probes
  * are keys-only triples. No collect, no single-reducer stage. */
object NegativeSampling {

  /** @param positives  (qCol, posCol) training pairs, numeric ids
    * @param candidates corpus frame holding numeric candCol
    * @return (qCol, posCol, neg_idx, neg_<candCol>): up to k rows per
    *         input pair, neg_idx in [1, k] */
  def negatives(positives: DataFrame, candidates: DataFrame,
                qCol: String, posCol: String, candCol: String,
                k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000]: $k")
    val qc = col("`" + qCol.replace("`", "``") + "`")
    val pc = col("`" + posCol.replace("`", "``") + "`")
    val cc = col("`" + candCol.replace("`", "``") + "`")
    val dist = candidates.select(cc.cast("long").as("v"))
      .where(col("v").isNotNull).distinct()
      .select(lit("").as("c"), col("v"), lit(1L).as("cnt"))
    val n = dist.count()
    require(n >= 2, s"need at least 2 distinct candidates, got $n")
    require(n <= Sampling.Buckets,
      s"$n distinct candidates exceed the draw resolution " +
        s"(Sampling.Buckets = ${Sampling.Buckets}): ranks >= " +
        s"${Sampling.Buckets} could never be drawn. Shard the " +
        "candidate table and union per-shard draws.")
    val ranked = graft.operators.Distributions.cumulativeByKey(dist)
      .select(col("v").as("__neg"), (col("e") - 1L).as("__rank"))
    val probes = positives.select(qc, pc)
      .withColumn("neg_idx", explode(sequence(lit(1), lit(k))))
      .withColumn("__rank",
        pmod(Sampling.portableBucket(
          qc.cast("long") * 31L + col("neg_idx") + lit(seed)), lit(n)))
    probes.join(ranked, Seq("__rank"))
      .where(col("__neg") =!= pc.cast("long") &&
        col("__neg") =!= qc.cast("long"))
      .select(qc, pc, col("neg_idx"), col("__neg").as(s"neg_$candCol"))
  }
}
