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

  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
                           shards: Int = 64): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    val key = shuffleKey(col(idCol), seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", key)
      .withColumn("shard", pmod(col("shuffle_key"), lit(shards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** Materialize the shuffle as training shards: one parquet directory
    * per `shard=N`, rows inside each shard ordered by the shuffle key
    * (parquet row order within the written files). The repartition
    * rides the SAME shard hash the window already needs, so the write
    * costs exactly one exchange; readers stream shard directories
    * independently and see the reproducible order. */
  def writeShards(df: DataFrame, idCol: String, path: String,
                  seed: Long = 42L, shards: Int = 64): Unit =
    deterministicShuffle(df, idCol, seed, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
