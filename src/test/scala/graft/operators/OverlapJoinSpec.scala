package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapJoinSpec extends SparkSpec {
  import spark.implicits._

  private def gen(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    def side(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(950).toLong
      (rnd.nextInt(6).toLong, s, s + 1 + rnd.nextInt(120).toLong, idBase + i)
    }
    (side(120, 0L), side(90, 1000L))
  }

  private def naiveOverlap(ls: Seq[(Long, Long, Long, Long)],
                           rs: Seq[(Long, Long, Long, Long)]) =
    (for {
      l <- ls
      r <- rs
      if l._1 == r._1 && l._2 < r._3 && r._2 < l._3
    } yield (l._4, r._4)).toSet

  test("inner overlap join equals the naive inequality join, once per pair") {
    val (ls, rs) = gen(42)
    val left = ls.toDF("key", "a_start", "a_end", "a_id")
    val right = rs.toDF("key", "b_start", "b_end", "b_id")
    val want = naiveOverlap(ls, rs)
    for (g <- Seq(7L, 64L, 1000L)) {
      val rows = RangeJoin.overlap(left, right, Seq("key"),
          "a_start", "a_end", "b_start", "b_end", granularity = g)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.toSet.size, s"granularity $g duplicated pairs")
      assert(rows.toSet == want, s"granularity $g diverged")
    }
  }

  test("left join keeps partnerless left intervals with null payload") {
    val left = Seq((1L, 0L, 10L, 1L), (1L, 100L, 110L, 2L), (2L, 0L, 10L, 3L))
      .toDF("key", "a_start", "a_end", "a_id")
    val right = Seq((1L, 5L, 15L, 9L)).toDF("key", "b_start", "b_end", "b_id")
    val got = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 8L,
        joinType = "left")
      .select("a_id", "b_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(9L), 2L -> None, 3L -> None))
  }

  test("half-open boundaries: touching intervals do not overlap") {
    val left = Seq((1L, 0L, 16L, 1L)).toDF("key", "a_start", "a_end", "a_id")
    val right = Seq((1L, 16L, 32L, 2L), (1L, 15L, 16L, 3L))
      .toDF("key", "b_start", "b_end", "b_id")
    val got = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 16L)
      .select("b_id").as[Long].collect().toSet
    assert(got == Set(3L)) // [0,16) meets [15,16), not [16,32)
  }

  test("containment and multi-bucket spans still meet exactly once") {
    // right interval contained in a long left one spanning many buckets
    val left = Seq((1L, 0L, 1000L, 1L)).toDF("key", "a_start", "a_end", "a_id")
    val right = Seq((1L, 400L, 410L, 2L), (1L, 990L, 2000L, 3L))
      .toDF("key", "b_start", "b_end", "b_id")
    val rows = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 16L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(rows.size == rows.toSet.size, "pair met more than once")
    assert(rows.toSet == Set((1L, 2L), (1L, 3L)))
  }

  test("timestamp intervals bucketize on microseconds") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val left = Seq((1L, at(0), at(2700), 1L)).toDF("key", "a_s", "a_e", "a_id")
    val right = Seq((1L, at(2699), at(5000), 2L), (1L, at(2700), at(5000), 3L))
      .toDF("key", "b_s", "b_e", "b_id")
    val got = RangeJoin.overlap(left, right, Seq("key"), "a_s", "a_e",
        "b_s", "b_e", granularity = 15L * 60 * 1000000)
      .select("b_id").as[Long].collect().toSet
    assert(got == Set(2L)) // end-exclusive: the touch at 2700s misses
  }

  test("degenerate intervals drop from matching; left join surfaces them unmatched") {
    val left = Seq((1L, 10L, 10L, 1L), (1L, 20L, 5L, 2L), (1L, 0L, 30L, 3L))
      .toDF("key", "a_start", "a_end", "a_id")
    val right = Seq((1L, 0L, 100L, 9L)).toDF("key", "b_start", "b_end", "b_id")
    val inner = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 8L)
      .select("a_id").as[Long].collect().toSet
    assert(inner == Set(3L))
    val lj = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 8L,
        joinType = "left")
      .select("a_id", "b_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(lj == Map(1L -> None, 2L -> None, 3L -> Some(9L)))
  }

  test("duplicate left rows keep their multiplicity through a left join") {
    val left = Seq((1L, 0L, 10L, 7L), (1L, 0L, 10L, 7L),
        (1L, 50L, 60L, 8L), (1L, 50L, 60L, 8L))
      .toDF("key", "a_start", "a_end", "a_id")
    val right = Seq((1L, 5L, 15L, 9L)).toDF("key", "b_start", "b_end", "b_id")
    val got = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 8L,
        joinType = "left")
      .select("a_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(7L, 7L, 8L, 8L))
  }

  test("plan stays an equi-join on (key, bucket) — no nested loop") {
    val (ls, rs) = gen(7)
    val left = ls.toDF("key", "a_start", "a_end", "a_id")
    val right = rs.toDF("key", "b_start", "b_end", "b_id")
    val plan = RangeJoin.overlap(left, right, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", granularity = 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"must stay an equi-join:\n$plan")
  }

  test("misuse is loud: colliding columns, bad types, overlong spans") {
    val left = Seq((1L, 0L, 10L, 1L)).toDF("key", "a_start", "a_end", "x")
    val right = Seq((1L, 5L, 15L, 2L)).toDF("key", "b_start", "b_end", "x")
    val ex = intercept[IllegalArgumentException](RangeJoin.overlap(
      left, right, Seq("key"), "a_start", "a_end", "b_start", "b_end", 8L))
    assert(ex.getMessage.contains("collides"))
    val huge = Seq((1L, 0L, 10000000L, 2L)).toDF("key", "b_start", "b_end", "b_id")
    val ex2 = intercept[Exception](RangeJoin.overlap(
      left.toDF("key", "a_start", "a_end", "a_id"), huge, Seq("key"),
      "a_start", "a_end", "b_start", "b_end", granularity = 2L,
      maxBucketsPerInterval = 100).count())
    assert(ex2.getMessage != null)
  }
}
