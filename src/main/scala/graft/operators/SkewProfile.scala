package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/aggregation-key skew diagnostics — the pre-flight check for
  * every big shuffle: BEFORE running a 100 TB join on `key`, profile
  * the key distribution and learn whether one hot key will pin a
  * single reducer (the classic straggler) and what salt factor would
  * level it. This engine ships skew REMEDIES (salted aggregation,
  * salted-broadcast join, AQE guidance); this is the measurement side
  * that says when to reach for them.
  *
  * Output (one row): n_rows, n_keys, max_count + its key, avg_count,
  * skew_factor = max/avg (1.0 = perfectly level), top10_share (mass in
  * the 10 hottest keys), entropy_ratio = H(keys)/ln(n_keys) (1.0 =
  * uniform, →0 = one key dominates; 1.0 by convention for a single
  * key), and suggested_salt = ceil(skew_factor) capped at `maxSalt` —
  * the replication factor that splits the hot key into ~avg-sized
  * slices.
  *
  * Determinism: the hottest key reports the SMALLEST key (as string)
  * among ties; doubles round to `roundTo` with the engine-portable
  * floor(x·10^r + 0.5) rule.
  *
  * Scale shape: one keys-only count aggregation (the same shuffle the
  * profiled join would do, minus the payload), then a single-row
  * reduction over the counts frame; the top-10 mass folds through
  * one bounded sort-limit (TakeOrdered, never a full sort). */
object SkewProfile {

  def profile(df: DataFrame, keyCol: String, maxSalt: Int = 64,
              roundTo: Int = 6): DataFrame = {
    require(maxSalt >= 1, s"maxSalt must be >= 1: $maxSalt")
    val rf = math.pow(10.0, roundTo)
    def r(c: Column) = floor(c * rf + 0.5) / rf
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    // top-10 hottest keys: bounded sort-limit, then a 1-row agg
    val top10 = counts.orderBy(col("__c").desc, col("__k").asc).limit(10)
      .agg(sum(col("__c")).as("__top10"))
    val totals = counts.agg(
      sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__c")).as("max_count"),
      sum(-col("__c") * log(col("__c").cast("double"))).as("__nH"))
    // hot_key = smallest key among max-count ties (deterministic),
    // resolved by one keys-only semi-pass against the 1-row max
    val withMax = totals.crossJoin(broadcast(top10))
    val hotKey = counts
      .join(broadcast(totals.select(col("max_count"))),
        counts("__c") === col("max_count"))
      .agg(min(col("__k")).as("hot_key"))
    withMax.crossJoin(broadcast(hotKey))
      .select(
        col("n_rows"), col("n_keys"), col("hot_key"), col("max_count"),
        r(col("n_rows").cast("double") / col("n_keys")).as("avg_count"),
        r(col("max_count") * col("n_keys").cast("double") / col("n_rows"))
          .as("skew_factor"),
        r(col("__top10").cast("double") / col("n_rows")).as("top10_share"),
        // H = ln(N) + (Σ -c·ln c)/N over counts; ratio vs ln(n_keys)
        r(when(col("n_keys") === 1, lit(1.0))
          .otherwise(
            (log(col("n_rows").cast("double")) +
              col("__nH") / col("n_rows")) /
            log(col("n_keys").cast("double")))).as("entropy_ratio"),
        least(ceil(col("max_count") * col("n_keys").cast("double") /
            col("n_rows")).cast("int"), lit(maxSalt))
          .as("suggested_salt"))
  }
}
