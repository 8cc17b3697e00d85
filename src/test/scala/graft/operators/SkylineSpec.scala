package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Naive NOT-EXISTS dominance reference. */
  private def naive(rows: Seq[(String, Long, Double, Long)],
                    maxX: Boolean, maxY: Boolean) = {
    def geX(a: Long, b: Long) = if (maxX) a >= b else a <= b
    def gtX(a: Long, b: Long) = if (maxX) a > b else a < b
    def geY(a: Double, b: Double) = if (maxY) a >= b else a <= b
    def gtY(a: Double, b: Double) = if (maxY) a > b else a < b
    rows.filterNot { p =>
      rows.exists(d => d._1 == p._1 && geX(d._2, p._2) && geY(d._3, p._3) &&
        (gtX(d._2, p._2) || gtY(d._3, p._3)))
    }.map(_._4).toSet
  }

  test("random data matches NOT-EXISTS dominance, all four directions") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 600).map(i => (s"g${rnd.nextInt(3)}",
      rnd.nextInt(40).toLong, rnd.nextInt(40).toDouble, i.toLong))
    val df = rows.toDF("grp", "x", "y", "row_id")
    for (mx <- Seq(true, false); my <- Seq(true, false)) {
      val got = Skyline.skyline(df, Seq("grp"), "x", "y", mx, my)
        .select("row_id").as[Long].collect().toSet
      assert(got == naive(rows, mx, my), s"maxX=$mx maxY=$my diverged")
    }
  }

  test("keyless skyline: one global frontier") {
    val df = Seq((1L, 1.0, 10L), (2L, 3.0, 11L), (3L, 2.0, 12L),
        (3L, 3.0, 13L), (1L, 4.0, 14L))
      .toDF("x", "y", "row_id")
    val got = Skyline.skyline(df, Nil, "x", "y")
      .select("row_id").as[Long].collect().toSet
    // (3,3) dominates (2,3),(3,2),(1,1); (1,4) survives on y
    assert(got == Set(13L, 14L))
  }

  test("exact ties on both dimensions all survive; y ties need best x") {
    val df = Seq((5L, 5.0, 1L), (5L, 5.0, 2L), (4L, 5.0, 3L), (5L, 4.0, 4L))
      .toDF("x", "y", "row_id")
    val got = Skyline.skyline(df, Nil, "x", "y")
      .select("row_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // duplicates co-survive; (4,5),(5,4) dominated
  }

  test("null dimensions are excluded, not skyline members") {
    val df = Seq((Some(9L), Some(9.0), 1L), (None, Some(99.0), 2L),
        (Some(99L), None, 3L), (Some(1L), Some(1.0), 4L))
      .toDF("x", "y", "row_id")
    val got = Skyline.skyline(df, Nil, "x", "y")
      .select("row_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("groups are independent frontiers") {
    val df = Seq(("a", 1L, 1.0, 1L), ("b", 1L, 1.0, 2L), ("a", 2L, 2.0, 3L))
      .toDF("grp", "x", "y", "row_id")
    val got = Skyline.skyline(df, Seq("grp"), "x", "y")
      .select("row_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L)) // (a,1,1) dominated only within group a
  }

  test("plan has no nested loop and no cartesian product") {
    val df = (1 to 500).map(i => ((i % 7).toLong, (i % 13).toDouble,
      i.toLong)).toDF("x", "y", "row_id")
    val plan = Skyline.skyline(df, Nil, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"pairwise-free claim broken:\n$plan")
  }

  test("misuse is loud: same column twice, missing columns, reserved names") {
    val df = Seq((1L, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException](Skyline.skyline(df, Nil, "x", "x"))
    intercept[IllegalArgumentException](Skyline.skyline(df, Nil, "x", "nope"))
    intercept[IllegalArgumentException](Skyline.skyline(
      df.withColumn("__best_y", lit(1)), Nil, "x", "y"))
  }
}
