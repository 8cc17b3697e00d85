package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CollectCapped.collect_longs_capped

/** Edit-distance similarity join over a vocabulary, blocked by
  * SymSpell-style deletion neighborhoods (Garbe's symmetric delete
  * algorithm; the same blocking FastSS described first — Bocek et al.
  * 2007, "Fast Similarity Search in Large Dictionaries").
  *
  * Completeness argument for maxDist = 1: if lev(a, b) ≤ 1 then either
  * a = b (share the identity variant), one is a single-char deletion
  * of the other (b ∈ del1(a) or vice versa), or they differ by one
  * substitution (deleting the differing position from both yields the
  * same string, so del1(a) ∩ del1(b) ≠ ∅). Every true pair therefore
  * meets in at least one deletion-variant bucket — the blocking NEVER
  * misses — and every candidate is verified with a real
  * `levenshtein()` call, so the result is EXACTLY the brute-force
  * join's (the DuckDB oracle replays it as a cross join).
  *
  * Scale shape: the corpus first collapses to DISTINCT strings (a
  * vocabulary — the real-world shape for typo clustering / query
  * correction; vocab ≪ corpus at 100 TB). Each vocab string explodes
  * into len+1 variants hashed to 8 bytes, so the bucket pass shuffles
  * (variant-hash, string-id) pairs only — never the strings. Hot
  * variants (a common deletion shared by thousands of strings) hit
  * the same capped native collect every LSH family here uses: the
  * bucket poisons its bounded buffer and drops, bounding per-group
  * memory at every stage. Only verified candidates re-join the
  * strings for the final levenshtein check. */
object EditSim {

  /** All single-char deletions of `s`, plus `s` itself. */
  private def deletionVariants(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Distinct-string pairs within levenshtein distance `maxDist`
    * (currently 1 — the provably complete deletion-neighborhood
    * radius). Output: (a, b, dist) with a < b lexicographically. */
  def vocabPairs(df: DataFrame, strCol: String, maxDist: Int = 1,
                 maxBucketSize: Int = 100000): DataFrame = {
    require(maxDist == 1,
      "deletion-neighborhood blocking is provably complete for " +
        "maxDist=1; larger radii need multi-delete variant sets")
    val vocab = df.select(col(strCol).as("__s"))
      .filter(col("__s").isNotNull).distinct()
      .withColumn("__sid", xxhash64(col("__s")))
    val keys = vocab.select(col("__sid"),
      explode(deletionVariants(col("__s"))).as("__v"))
      .select(col("__sid"), xxhash64(col("__v")).as("__vk"))
    val buckets = keys.groupBy(col("__vk"))
      .agg(collect_longs_capped(col("__sid"), maxBucketSize).as("sids"))
      .filter(col("sids").isNotNull && size(col("sids")) > 1)
    val nShuffle = df.sparkSession.sessionState.conf.numShufflePartitions
    val cand = buckets
      .select(posexplode(col("sids")).as(Seq("i", "sid_a")), col("sids"))
      .select(col("sid_a"),
        explode(slice(col("sids"), col("i") + 2,
          greatest(size(col("sids")) - col("i") - 1, lit(0)))).as("sid_b"))
      .repartition(nShuffle, col("sid_a"), col("sid_b"))
      .dropDuplicates("sid_a", "sid_b")
    cand
      .join(vocab.select(col("__sid").as("sid_a"), col("__s").as("__a")), Seq("sid_a"))
      .join(vocab.select(col("__sid").as("sid_b"), col("__s").as("__b")), Seq("sid_b"))
      .withColumn("dist", levenshtein(col("__a"), col("__b")))
      .filter(col("dist") <= maxDist)
      .select(least(col("__a"), col("__b")).as("a"),
        greatest(col("__a"), col("__b")).as("b"), col("dist"))
  }
}
