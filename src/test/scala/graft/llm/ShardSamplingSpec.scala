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
