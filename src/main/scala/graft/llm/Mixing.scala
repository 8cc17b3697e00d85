package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted interleave: the ORDER side of a training
  * mixture. [[Sampling.mixture]] decides WHICH rows make the corpus;
  * this decides the sequence they are streamed in, so every prefix of
  * the training stream carries the sources in their target ratio —
  * "2 parts web to 1 part code" must hold at step 10k, not just at the
  * end of the epoch. `df.orderBy(rand())` gives neither the ratio nor
  * reproducibility.
  *
  * Each row gets a `virtual_time` (stride-scheduling style): u · |s| / w,
  * where u ∈ [0,1) is the row's seeded portable hash position inside
  * its source, |s| the source's row count and w its weight. Rows with
  * virtual_time ≤ T are ≈ w·T PER SOURCE regardless of source size, so
  * consuming rows in ascending (virtual_time, source, id) order yields
  * the weight ratio at every prefix (binomial concentration around it
  * — exact to ~1e-4 at real corpus sizes) until a source runs dry
  * (virtual_time > |s|·max(u)/w ceases to produce rows, and the
  * remaining sources continue in their re-normalized ratio — the same
  * exhaustion behavior as stride scheduling).
  *
  * Scale shape: ONE |sources|-row count aggregate to the driver (same
  * bounded collect as [[Sampling.mixture]]), then a shuffle-free
  * codegen'd projection — no windows, no per-source global ranks (a
  * rank window partitioned by source would funnel the largest source
  * into one partition: a guaranteed straggler at exactly this
  * operator's scale). The order is delivered as a SORT KEY, not a
  * materialized global sort: feed it to [[Shuffling.writeShards]]-style
  * per-shard sorted output, or sort-merge shard streams at read time.
  * Deterministic: same (ids, weights, seed) → same virtual times, on
  * any cluster. Ties are broken by (source, id) downstream, making the
  * total order well-defined.
  */
object Mixing {

  /** Append `virtual_time` (double, rounded to `roundTo` so the value
    * is bit-stable across engines). Every source present in `df` must
    * carry a weight — a silently unweighted source would vanish from
    * the schedule's contract; weights for absent sources error too
    * (same loudness contract as [[Sampling.mixture]]). */
  def interleave(df: DataFrame, sourceCol: String, idCol: String,
                 weights: Map[String, Double], seed: Long = 42L,
                 roundTo: Int = 6): DataFrame = {
    require(weights.nonEmpty, "interleave needs at least one source weight")
    require(weights.values.forall(_ > 0.0), s"weights must be > 0: $weights")
    Guards.requireFreshColumns(df, Seq("virtual_time"), "Mixing.interleave")
    val srcStr = col(sourceCol).cast("string")
    val countRows = df.groupBy(srcStr.as("__source")).count().collect()
    // a null source can carry no weight — fail with the module's loud
    // typed error instead of an NPE out of the weight-coverage check
    require(!countRows.exists(_.isNullAt(0)),
      s"'$sourceCol' contains null values — every row needs a weighted source")
    val counts: Map[String, Long] =
      countRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val unweighted = counts.keySet -- weights.keySet
    require(unweighted.isEmpty,
      s"sources present without a weight: ${unweighted.toSeq.sorted.mkString(", ")}")
    val absent = weights.keySet -- counts.keySet
    require(absent.isEmpty,
      s"weighted sources with zero rows: ${absent.toSeq.sorted.mkString(", ")}")
    // |s| / w per source, folded into one codegen'd CASE chain
    val scale = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0): Column) {
      case (acc, (s, w)) =>
        when(srcStr === lit(s), lit(counts(s) / w)).otherwise(acc)
    }
    val u = Shuffling.shuffleKey(col(idCol), seed)
      .cast("double") / lit(Sampling.Buckets.toDouble)
    df.withColumn("virtual_time", round(u * scale, roundTo))
  }
}
