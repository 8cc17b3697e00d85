package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Heatmap2dSpec extends SparkSpec {
  import spark.implicits._

  test("pinned ranges: exact cell assignment, hi folds into the last bin") {
    val df = Seq((0.0, 0.0), (4.9, 9.9), (5.0, 10.0), (10.0, 20.0),
        (2.5, 0.1)).toDF("x", "y")
    val got = TableProfile.heatmap2d(df, "x", "y", bins = 4,
        xLo = Some(0), xHi = Some(10), yLo = Some(0), yHi = Some(20))
      .select("xbin", "ybin", "n").as[(Long, Long, Long)]
      .collect().toSet
    // widths 2.5 / 5.0; (10,20) folds into cell (3,3)
    assert(got == Set((0L, 0L, 1L), (1L, 1L, 1L), (2L, 2L, 1L),
      (3L, 3L, 1L), (1L, 0L, 1L)))
    assert(got.toSeq.map(_._3).sum == 5)
  }

  test("out-of-range and null rows drop; empty cells are absent") {
    val df = Seq((Some(1.0), Some(1.0)), (Some(99.0), Some(1.0)),
        (None, Some(1.0))).toDF("x", "y")
    val got = TableProfile.heatmap2d(df, "x", "y", bins = 2,
        xLo = Some(0), xHi = Some(10), yLo = Some(0), yHi = Some(10))
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("n") == 1L)
  }

  test("data-derived ranges cover min..max; cell edges exposed") {
    val df = Seq((0.0, 0.0), (8.0, 16.0)).toDF("x", "y")
    val got = TableProfile.heatmap2d(df, "x", "y", bins = 2).collect()
    assert(got.map(_.getAs[Long]("n")).sum == 2)
    val cell = got.find(_.getAs[Long]("xbin") == 1L).get
    assert(cell.getAs[Double]("x_lo") == 4.0 &&
      cell.getAs[Double]("y_lo") == 8.0)
  }

  test("misuse is loud: same column, non-numeric, absurd bins") {
    val df = Seq((1.0, "s")).toDF("x", "s")
    intercept[IllegalArgumentException](
      TableProfile.heatmap2d(df, "x", "x"))
    intercept[IllegalArgumentException](
      TableProfile.heatmap2d(df, "x", "s"))
    intercept[IllegalArgumentException](
      TableProfile.heatmap2d(df.select(col("x"), lit(1.0).as("y")),
        "x", "y", bins = 0))
  }
}
