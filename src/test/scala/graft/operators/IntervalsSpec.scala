package graft.operators

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val sorted = iv.sortBy(identity)
    sorted.foldLeft(Vector.empty[(Long, Long, Long)]) {
      case (acc, (s, e)) =>
        acc.lastOption match {
          case Some((ls, le, n)) if s <= le =>
            acc.init :+ ((ls, math.max(le, e), n + 1))
          case _ => acc :+ ((s, e, 1L))
        }
    }
  }

  test("random intervals per key match the naive sweep") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val k = rnd.nextInt(5).toLong
      val s = rnd.nextInt(1000).toLong
      (k, s, s + rnd.nextInt(8))
    }
    val got = Intervals
      .coalesceIntervals(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(r => (r._2, r._3, r._4)).sortBy(identity).toSeq
      }
    val want = rows.groupBy(_._1).map { case (k, v) =>
      k -> naive(v.map(r => (r._2, r._3))).sortBy(identity)
    }
    assert(got == want)
  }

  test("touching intervals merge (closed ends); a gap of one splits") {
    val df = Seq((1L, 0L, 5L), (1L, 5L, 9L), (1L, 11L, 12L))
      .toDF("k", "s", "e")
    val got = Intervals.coalesceIntervals(df, Seq("k"), "s", "e")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((1L, 0L, 9L, 2L), (1L, 11L, 12L, 1L)))
  }

  test("containment and duplicate intervals absorb into one span") {
    val df = Seq((1L, 0L, 10L), (1L, 2L, 3L), (1L, 2L, 3L), (1L, 10L, 10L))
      .toDF("k", "s", "e")
    val got = Intervals.coalesceIntervals(df, Seq("k"), "s", "e")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 0L, 10L, 4L)))
  }

  test("null endpoints drop; empty keyCols merges globally") {
    val df = Seq(
      (1L, Some(0L), Some(2L)), (1L, None, Some(5L)), (2L, Some(1L), None))
      .map { case (k, s, e) =>
        (k, s.map(Long.box).orNull, e.map(Long.box).orNull)
      }.toDF("k", "s", "e")
    val keyed = Intervals.coalesceIntervals(df, Seq("k"), "s", "e").collect()
    assert(keyed.length == 1 && keyed.head.getLong(0) == 1L)
    val global = Intervals.coalesceIntervals(df, Seq.empty, "s", "e")
      .as[(Long, Long, Long)].collect()
    assert(global.toSeq == Seq((0L, 2L, 1L)))
  }

  test("guards: missing columns and mismatched endpoint types") {
    val df = Seq((1L, 1L, "x")).toDF("k", "s", "e")
    intercept[IllegalArgumentException](
      Intervals.coalesceIntervals(df, Seq("k"), "s", "nope"))
    intercept[IllegalArgumentException](
      Intervals.coalesceIntervals(df, Seq("k"), "s", "e"))
  }

  test("gaps: the islands' complement, per key, none for full coverage") {
    import spark.implicits._
    // key a: [1,5] [3,8] merge to [1,8]; [12,14] -> ONE gap (8, 12);
    // key b: overlapping everywhere -> no gaps
    val d = Seq(
      ("a", 1L, 5L), ("a", 3L, 8L), ("a", 12L, 14L),
      ("b", 1L, 10L), ("b", 2L, 20L)
    ).toDF("k", "s", "e")
    val out = Intervals.gaps(d, Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 8L, 12L)))
    // single span per key: no gap rows at all
    assert(Intervals.gaps(
      Seq(("x", 1L, 2L)).toDF("k", "s", "e"), Seq("k"), "s", "e")
      .count() == 0)
    // touching spans fused by the merge never yield zero-length gaps
    val touching = Intervals.gaps(
      Seq(("t", 1L, 5L), ("t", 5L, 9L), ("t", 11L, 12L))
        .toDF("k", "s", "e"), Seq("k"), "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(touching.toSeq == Seq((9L, 11L)))
  }
}
