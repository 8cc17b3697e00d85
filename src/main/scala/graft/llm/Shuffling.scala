package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding: the "serve the corpus in a
  * reproducible random order" step that sits between curation and
  * training. Training loaders want (a) an order that is uncorrelated
  * with the ingest order, (b) fixed-count shards that can be read in
  * parallel, and (c) bit-identical assignment across reruns so a resumed
  * run sees the same stream — `df.orderBy(rand())` gives none of these.
  *
  * Every row gets `(shard, shard_pos)`: shard = seeded hash of the id
  * mod `shards`, position = rank of the hash within the shard (ties
  * broken by id, so the total order is well-defined even at 1e6-bucket
  * hash granularity).
  *
  * Scale shape: one hash-partitioned shuffle by `shard` (exactly the
  * shuffle any sharded write needs anyway) and a per-shard sort — there
  * is NO global single-partition sort; each shard orders independently,
  * so 1000 executors sort 1000 shards concurrently. Downstream
  * `.repartition(col("shard"))` + `sortWithinPartitions` writes
  * training shards directly.
  */
object Shuffling {

  /** Seeded, SQL-portable shuffle key: the Knuth bucket of
    * `id + seed` — any engine can replay it (the DuckDB oracle does).
    * For production-grade mixing prefer `xxhash64(lit(seed), id)`;
    * the tie-break on id keeps BOTH variants a total order. */
  def shuffleKey(id: Column, seed: Long): Column =
    Sampling.portableBucket(id + lit(seed))

  /** ONE definition of the key/shard assignment and the per-shard
    * order, shared by both public shapes — a drift between them would
    * silently break writeShards' "same (shard, shard_pos) as
    * deterministicShuffle" guarantee. `between` lets shardedFrame
    * inject its repartition between keying and windowing. */
  private def withShardPos(df: DataFrame, idCol: String, seed: Long,
                           shards: Int,
                           between: DataFrame => DataFrame): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    Sampling.requireIntegralId(df, idCol, "Shuffling")
    Guards.requireFreshColumns(df, Seq("shuffle_key", "shard", "shard_pos"),
      "Shuffling")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    val keyed = df
      .withColumn("shuffle_key", shuffleKey(col(idCol), seed))
      .withColumn("shard", pmod(col("shuffle_key"), lit(shards.toLong)))
    between(keyed).withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
                           shards: Int = 64): DataFrame =
    withShardPos(df, idCol, seed, shards, identity)

  /** The frame [[writeShards]] writes, shaped for exactly ONE exchange:
    * the explicit `repartition(shards, shard)` comes BEFORE the window,
    * whose ClusteredDistribution(shard) that partitioning already
    * satisfies — windowing after the fact (as `deterministicShuffle`
    * plans it for the default shuffle.partitions) would make
    * EnsureRequirements insert a second full-data exchange to change
    * partition counts. Plan-asserted in PlanSpec. Hash collisions of
    * shard ids can give a writer slot two shards (bounded skew, noted);
    * a range repartition would balance exactly at the cost of a
    * sampling pass. */
  def shardedFrame(df: DataFrame, idCol: String, seed: Long,
                   shards: Int): DataFrame =
    withShardPos(df, idCol, seed, shards,
      _.repartition(shards, col("shard")))

  /** Per-shard reproducibility MANIFEST — the artifact a training run
    * records next to its shards so a resume (or an auditor) can prove
    * it is reading the same corpus in the same partitioning: per
    * shard, the row count, the id range, an order-independent XOR
    * fingerprint of the per-row hash, and the total content chars.
    * Any drift — a lost row, a duplicated shard file, a changed id,
    * truncated content — flips at least one column.
    *
    * The fingerprint is the full-range Knuth hash (`((id+seed) mod P)
    * · K mod P`, BEFORE the bucket fold) XOR-aggregated per shard:
    * order-independent (so it's one partial-aggregating pass, no
    * sort), overflow-free, and replayable in any SQL engine — same
    * portability contract as [[shuffleKey]].
    *
    * Scale shape: one narrow aggregation — (shard, hash, id, length)
    * rides the shuffle, content stays in the scan. */
  def shardManifest(df: DataFrame, idCol: String, contentCol: String,
                    seed: Long = 42L, shards: Int = 64): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    (Seq(idCol, contentCol)).foreach(c =>
      require(df.columns.contains(c), s"no such column '$c'"))
    Sampling.requireIntegralId(df, idCol, "Shuffling.shardManifest")
    val fullHash = pmod(
      pmod(col(idCol).cast("long") + lit(seed), lit(Sampling.P)) *
        lit(Sampling.K), lit(Sampling.P))
    df.select(
        pmod(shuffleKey(col(idCol), seed), lit(shards.toLong)).as("shard"),
        col(idCol).as("__id"), fullHash.as("__h"),
        coalesce(length(col(contentCol)).cast("long"), lit(0L)).as("__len"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"),
        expr("bit_xor(__h)").as("xor_fingerprint"),
        sum(col("__len")).as("content_chars"))
  }

  /** Materialize the shuffle as training shards: one parquet directory
    * per `shard=N`, rows inside each shard ordered by the shuffle key
    * (the window's required sort leaves each partition in
    * (shard, shard_pos) order, which the parquet writer preserves).
    * One full-data exchange total; readers stream shard directories
    * independently and see the reproducible order. */
  def writeShards(df: DataFrame, idCol: String, path: String,
                  seed: Long = 42L, shards: Int = 64): Unit =
    shardedFrame(df, idCol, seed, shards)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
