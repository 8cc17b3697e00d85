package graft.operators

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("exact line recovers slope/intercept with r2 = 1") {
    // y = 3x + 7 over x = 0..9
    val rows = (0L to 9L).map(x => (1L, x, 3 * x + 7))
    val got = Trend.fit(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().head
    assert(got.getLong(1) == 10L)
    assert(got.getDouble(2) == 3.0 && got.getDouble(3) == 7.0)
    assert(got.getDouble(4) == 1.0)
  }

  test("noisy data matches the closed-form OLS within rounding") {
    val rnd = new scala.util.Random(5)
    val pts = (0 until 200).map { i =>
      (i.toLong, (i * 2 + 100 + rnd.nextInt(21) - 10).toLong)
    }
    val rows = pts.map { case (x, y) => (1L, x, y) }
    val got = Trend.fit(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().head
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got.getDouble(2) - r6(slope)) < 1e-9)
    assert(got.getDouble(4) > 0.9, "strong linear signal must show in r2")
  }

  test("degenerate keys: single point and constant x give nulls; constant y gives slope 0, null r2") {
    val rows = Seq(
      (1L, 5L, 9L),                       // single point
      (2L, 4L, 1L), (2L, 4L, 9L),         // constant x
      (3L, 1L, 6L), (3L, 2L, 6L), (3L, 9L, 6L)) // constant y
    val got = Trend.fit(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).isNullAt(2) && got(1L).isNullAt(3) && got(1L).isNullAt(4))
    assert(got(2L).isNullAt(2) && got(2L).isNullAt(4))
    assert(got(3L).getDouble(2) == 0.0 && got(3L).getDouble(3) == 6.0)
    assert(got(3L).isNullAt(4), "0/0 variance explained is null, not 0")
  }

  test("guards: non-integer columns rejected, nulls dropped") {
    val dbl = Seq((1L, 1.0, 2L)).toDF("k", "x", "y")
    intercept[IllegalArgumentException](Trend.fit(dbl, Seq("k"), "x", "y"))
    val withNulls = Seq(
      (1L, Some(1L), Some(10L)), (1L, None, Some(5L)),
      (1L, Some(2L), Some(13L)), (1L, Some(3L), None))
      .map { case (k, x, y) =>
        (k, x.map(Long.box).orNull, y.map(Long.box).orNull)
      }.toDF("k", "x", "y")
    val got = Trend.fit(withNulls, Seq("k"), "x", "y").collect().head
    assert(got.getLong(1) == 2L && got.getDouble(2) == 3.0)
  }
}
