package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temperature-based domain rebalance + shard manifest. */
class ShardSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (
    (1L to 800L).map(i => (i, "en")) ++
      (801L to 900L).map(i => (i, "fr")) ++
      (901L to 925L).map(i => (i, "sw")))
    .toDF("doc_id", "lang")

  test("alpha < 1 flattens: low-resource keep-rates exceed the head's") {
    val kept = Sampling.temperatureSample(corpus, "lang", "doc_id",
        alpha = 0.3, targetTotal = 300)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keepRate = Map(
      "en" -> kept.getOrElse("en", 0L) / 800.0,
      "fr" -> kept.getOrElse("fr", 0L) / 100.0,
      "sw" -> kept.getOrElse("sw", 0L) / 25.0)
    assert(keepRate("sw") > keepRate("fr"))
    assert(keepRate("fr") > keepRate("en"))
    // overall close to the target (hash-bucket granularity + min(1,·))
    assert(math.abs(kept.values.sum - 300L) < 60)
  }

  test("alpha = 1 preserves the natural composition") {
    val kept = Sampling.temperatureSample(corpus, "lang", "doc_id",
        alpha = 1.0, targetTotal = 400)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every domain keeps ~ the same fraction (400/925)
    val f = 400.0 / 925.0
    assert(math.abs(kept("en") - 800 * f) / (800 * f) < 0.15)
    assert(math.abs(kept("fr") - 100 * f) / (100 * f) < 0.3)
  }

  test("no upsampling: a target above the corpus keeps everything") {
    val kept = Sampling.temperatureSample(corpus, "lang", "doc_id",
      alpha = 0.5, targetTotal = 10000)
    assert(kept.count() == 925L)
  }

  test("deterministic: same inputs give the identical kept set") {
    def ids = Sampling.temperatureSample(corpus, "lang", "doc_id",
        alpha = 0.5, targetTotal = 200)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == ids)
    intercept[IllegalArgumentException](
      Sampling.temperatureSample(corpus, "lang", "doc_id", 0.0, 10))
    intercept[IllegalArgumentException](
      Sampling.temperatureSample(corpus, "lang", "doc_id", 0.5, 0))
  }

  test("weighted sample: E-S keys decide, exactly k, zero-weight excluded") {
    val df = (1L to 300L).map(i => (i, (i % 7) + 1L)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 40, seed = 3L)
      .select("id").as[Long].collect().toSet
    assert(got.size == 40)
    // replay the rule naively
    val naive = (1L to 300L).map { i =>
      val b = ((((i + 3L) % 1000000007L) * 2654435761L) % 1000000007L) % 1000000L
      val u = (b + 0.5) / 1000000.0
      (math.pow(u, 1.0 / ((i % 7) + 1L)), i)
    }.sortBy { case (k, i) => (-k, i) }.take(40).map(_._2).toSet
    assert(got == naive)
    // determinism + seed sensitivity
    val again = Sampling.weightedSample(df, "id", "w", k = 40, seed = 3L)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    val other = Sampling.weightedSample(df, "id", "w", k = 40, seed = 4L)
      .select("id").as[Long].collect().toSet
    assert(other != got)
    // non-positive weights never sampled, even with k >= corpus
    val withZero = Seq((1L, 5L), (2L, 0L), (3L, -2L)).toDF("id", "w")
    val z = Sampling.weightedSample(withZero, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(z == Set(1L))
    intercept[IllegalArgumentException](
      Sampling.weightedSample(df, "id", "w", k = 0))
  }

  test("portable-hash samplers reject string ids with a typed error") {
    // the portable E-S / shuffle key adds the seed ARITHMETICALLY —
    // a string id would CAST-throw under ANSI or NULL-hash without
    // it (every row in one bucket); the guard makes it a typed error
    val s = Seq(("a", 5L), ("b", 3L)).toDF("id", "w")
    intercept[graft.core.GraftError.Configuration](
      Sampling.weightedSample(s, "id", "w", k = 1))
    intercept[graft.core.GraftError.Configuration](
      Sampling.weightedSamplePerGroup(s, Seq("w"), "id", "w", k = 1))
    intercept[graft.core.GraftError.Configuration](
      Sampling.tokenBudget(s, "id", "w", budget = 10, shards = 1))
    intercept[graft.core.GraftError.Configuration](
      Shuffling.deterministicShuffle(s, "id"))
    intercept[graft.core.GraftError.Configuration](
      Shuffling.shardManifest(s, "id", "w"))
    // the seeded xxhash64 bucket is the string-safe path: seed enters
    // as a hashed prefix, decisions stay deterministic and non-trivial
    val big = (1 to 400).map(i => s"doc_$i").toDF("id")
    val kept = Sampling.byHash(big, "id", 0.3,
      Sampling.bucketSeeded(7L)).count()
    val rest = Sampling.byHashComplement(big, "id", 0.3,
      Sampling.bucketSeeded(7L)).count()
    assert(kept + rest == 400 && kept > 0 && rest > 0)
    val kept2 = Sampling.byHash(big, "id", 0.3,
      Sampling.bucketSeeded(8L)).count()
    assert(kept2 > 0) // different seed still samples (not degenerate)
  }

  test("grouped weighted sample: per-group k, same key rule as global") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", (i % 5) + 1L))
      .toDF("id", "g", "w")
    val got = Sampling.weightedSamplePerGroup(df, Seq("g"), "id", "w",
        k = 10, seed = 3L)
      .select("g", "id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).toSet }
    assert(got.keySet == Set("g0", "g1", "g2"))
    assert(got.values.forall(_.size == 10))
    // per-group picks = the global rule restricted to the group
    def naiveGroup(g: String): Set[Long] =
      (1L to 200L).filter(i => s"g${i % 3}" == g).map { i =>
        val b = ((((i + 3L) % 1000000007L) * 2654435761L) % 1000000007L) % 1000000L
        (math.pow((b + 0.5) / 1000000.0, 1.0 / ((i % 5) + 1L)), i)
      }.sortBy { case (k2, i) => (-k2, i) }.take(10).map(_._2).toSet
    got.foreach { case (g, ids) => assert(ids == naiveGroup(g), g) }
    intercept[IllegalArgumentException](
      Sampling.weightedSamplePerGroup(df, Seq.empty, "id", "w", 5))
  }

  test("bucket batches: boundaries, batch arithmetic, per-batch padding bound") {
    val df = Seq(
      (1L, 10L), (2L, 499L), (3L, 500L), (4L, 1499L),
      (5L, 1500L), (6L, 2999L), (7L, 3000L), (8L, 9999L))
      .toDF("id", "toks")
    val got = Packing.bucketBatches(df, "id", "toks",
        edges = Seq(500L, 1500L, 3000L), batchSize = 2)
      .select("id", "bucket", "batch_idx", "batch_pos")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 0 && got(2L)._2 == 0, "< 500 is bucket 0")
    assert(got(3L)._2 == 1 && got(4L)._2 == 1, "edge value moves up")
    assert(got(5L)._2 == 2 && got(6L)._2 == 2)
    assert(got(7L)._2 == 3 && got(8L)._2 == 3, "last bucket open-ended")
    // within bucket 0: (10, 499) -> batch 0 positions 0,1
    assert(got(1L)._3 == 0 && got(1L)._4 == 0)
    assert(got(2L)._3 == 0 && got(2L)._4 == 1)
    // batch splits: three rows in one bucket, batchSize 2 -> 2 batches
    val three = Seq((1L, 5L), (2L, 6L), (3L, 7L)).toDF("id", "toks")
    val g3 = Packing.bucketBatches(three, "id", "toks", Seq(100L), 2)
      .select("id", "batch_idx").as[(Long, Long)].collect().toMap
    assert(g3 == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    intercept[IllegalArgumentException](
      Packing.bucketBatches(df, "id", "toks", Seq(500L, 500L), 2))
    intercept[IllegalArgumentException](
      Packing.bucketBatches(df, "id", "toks", Seq(500L), 0))
  }

  test("shard manifest: totals reconcile and any drift flips a column") {
    val docs = (1L to 500L).map(i => (i, "x" * (i % 37).toInt))
      .toDF("doc_id", "text")
    val m = Shuffling.shardManifest(docs, "doc_id", "text", seed = 7L,
        shards = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(m.keySet.subsetOf((0L until 4L).toSet))
    assert(m.values.map(_._1).sum == 500L)
    assert(m.values.map(_._5).sum ==
      (1L to 500L).map(i => (i % 37)).sum)

    // manifest equals the manifest of the same corpus arriving in a
    // different partitioning/order (order-independence of the XOR)
    val m2 = Shuffling.shardManifest(
        docs.repartition(13).sortWithinPartitions("text"),
        "doc_id", "text", seed = 7L, shards = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(m2 == m)

    // drop one row → its shard's count AND fingerprint change
    val m3 = Shuffling.shardManifest(docs.filter($"doc_id" =!= 250L),
        "doc_id", "text", seed = 7L, shards = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val changed = m.keys.filter(k => m.get(k) != m3.get(k))
    assert(changed.size == 1)
    val k = changed.head
    assert(m3(k)._1 == m(k)._1 - 1 && m3(k)._4 != m(k)._4)

    // truncated content (same ids) → only content_chars moves
    val m4 = Shuffling.shardManifest(
        docs.select($"doc_id", substring($"text", 1, 1).as("text")),
        "doc_id", "text", seed = 7L, shards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(m4.values.sum < m.values.map(_._5).sum)
  }
}
