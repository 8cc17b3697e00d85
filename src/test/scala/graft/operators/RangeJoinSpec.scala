package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def gen(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val facts = (1 to 400).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("key", "t", "fact_id")
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextInt(950).toLong
      (rnd.nextInt(6).toLong, s, s + 1 + rnd.nextInt(120).toLong, i.toLong)
    }.toDF("key", "start_t", "end_t", "iv_id")
    (facts, ivs)
  }

  private def naive(facts: Seq[(Long, Long, Long)],
                    ivs: Seq[(Long, Long, Long, Long)]) =
    (for {
      f <- facts
      iv <- ivs
      if f._1 == iv._1 && f._2 >= iv._2 && f._2 < iv._3
    } yield (f._3, iv._4)).toSet

  test("inner range join equals the naive inequality join") {
    val (facts, ivs) = gen(42)
    val fRows = facts.as[(Long, Long, Long)].collect().toSeq
    val iRows = ivs.as[(Long, Long, Long, Long)].collect().toSeq
    for (g <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.join(facts, ivs, Seq("key"), "t", "start_t", "end_t",
          granularity = g)
        .select("fact_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got == naive(fRows, iRows), s"granularity $g diverged")
    }
  }

  test("left join keeps facts with no containing interval, null payload") {
    val facts = Seq((1L, 10L, 100L), (1L, 500L, 101L)).toDF("key", "t", "fact_id")
    val ivs = Seq((1L, 5L, 20L, 7L)).toDF("key", "start_t", "end_t", "iv_id")
    val got = RangeJoin.join(facts, ivs, Seq("key"), "t", "start_t", "end_t",
        granularity = 16L, joinType = "left")
      .select("fact_id", "iv_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(100L -> Some(7L), 101L -> None))
  }

  test("boundary semantics: start inclusive, end exclusive, across buckets") {
    val facts = Seq((1L, 32L, 1L), (1L, 48L, 2L), (1L, 31L, 3L))
      .toDF("key", "t", "fact_id")
    // interval [32, 48): ends exactly on a bucket boundary at g=16
    val ivs = Seq((1L, 32L, 48L, 9L)).toDF("key", "start_t", "end_t", "iv_id")
    val got = RangeJoin.join(facts, ivs, Seq("key"), "t", "start_t", "end_t",
        granularity = 16L)
      .select("fact_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("timestamp time columns bucketize on microseconds") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val facts = Seq((1L, at(0), 1L), (1L, at(1800), 2L), (1L, at(2700), 3L))
      .toDF("key", "ts", "fact_id")
    val ivs = Seq((1L, at(0), at(2700), 5L)).toDF("key", "s", "e", "iv_id")
    val got = RangeJoin.join(facts, ivs, Seq("key"), "ts", "s", "e",
        granularity = 15L * 60 * 1000000) // 15 min in micros
      .select("fact_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // 2700s = end, exclusive
  }

  test("overlapping intervals produce one row per containing interval") {
    val facts = Seq((1L, 10L, 1L)).toDF("key", "t", "fact_id")
    val ivs = Seq((1L, 0L, 20L, 1L), (1L, 5L, 15L, 2L), (1L, 11L, 20L, 3L))
      .toDF("key", "start_t", "end_t", "iv_id")
    val got = RangeJoin.join(facts, ivs, Seq("key"), "t", "start_t", "end_t",
        granularity = 8L)
      .select("iv_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("degenerate intervals (start >= end) never match; overlong intervals are loud") {
    val facts = Seq((1L, 10L, 1L)).toDF("key", "t", "fact_id")
    val bad = Seq((1L, 10L, 10L, 1L), (1L, 20L, 5L, 2L))
      .toDF("key", "start_t", "end_t", "iv_id")
    assert(RangeJoin.join(facts, bad, Seq("key"), "t", "start_t", "end_t",
      granularity = 4L).count() == 0)
    val huge = Seq((1L, 0L, 1000000L, 1L)).toDF("key", "start_t", "end_t", "iv_id")
    val ex = intercept[Exception](
      RangeJoin.join(facts, huge, Seq("key"), "t", "start_t", "end_t",
        granularity = 2L, maxBucketsPerInterval = 100).count())
    assert(ex.getMessage != null)
  }

  test("keyless lookup: empty `on` still joins via the bucket equi-key") {
    // ip→geo style: no entity key, just interval containment
    val facts = Seq((5L, 1L), (25L, 2L), (99L, 3L)).toDF("addr", "fact_id")
    val ranges = Seq((0L, 10L, 100L), (20L, 30L, 200L))
      .toDF("lo", "hi", "geo")
    val got = RangeJoin.join(facts, ranges, Nil, "addr", "lo", "hi",
        granularity = 8L, joinType = "left")
      .select("fact_id", "geo").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None))
    // and the plan is still an equi-join on the bucket, not a nested loop
    val plan = RangeJoin.join(facts, ranges, Nil, "addr", "lo", "hi",
      granularity = 8L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"keyless must stay equi:\n$plan")
  }

  test("plan: hash/sort-merge equi-join on (key, bucket) — no nested loop") {
    val (facts, ivs) = gen(7)
    val plan = RangeJoin.join(facts, ivs, Seq("key"), "t", "start_t", "end_t",
      granularity = 64L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }
}
