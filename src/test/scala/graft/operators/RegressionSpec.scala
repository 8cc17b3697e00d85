package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("exact plane recovers coefficients with r2 = 1") {
    // y = 2 + 3·x1 − x2 over non-collinear points
    val pts = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 2L), (2L, 4L))
    val df = pts.map { case (x1, x2) =>
      ("k", x1, x2, 2 + 3 * x1 - x2) }.toDF("k", "x1", "x2", "y")
    val r = Regression.fit2(df, Seq("k"), "x1", "x2", "y").collect()(0)
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("b0") == 2.0 && r.getAs[Double]("b1") == 3.0 &&
      r.getAs[Double]("b2") == -1.0 && r.getAs[Double]("r2") == 1.0)
  }

  test("hand-computed noisy fit matches the normal equations") {
    // moments computed by hand for y with one perturbed point:
    // same plane but point (2,4) reports y=5 instead of 4
    val rows = Seq((1L, 1L, 4L), (2L, 1L, 7L), (1L, 2L, 3L),
      (3L, 2L, 9L), (2L, 4L, 5L))
    val df = rows.map { case (a, b, y) => ("k", a, b, y) }
      .toDF("k", "x1", "x2", "y")
    val r = Regression.fit2(df, Seq("k"), "x1", "x2", "y").collect()(0)
    // driver-side replay of the same exact algebra
    val n = rows.size.toLong
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum
    val sy = rows.map(_._3).sum
    val s11 = rows.map(p => p._1 * p._1).sum
    val s22 = rows.map(p => p._2 * p._2).sum
    val s12 = rows.map(p => p._1 * p._2).sum
    val s1y = rows.map(p => p._1 * p._3).sum
    val s2y = rows.map(p => p._2 * p._3).sum
    def det3(a: BigInt, b: BigInt, c: BigInt, d: BigInt, e: BigInt,
             f: BigInt, g: BigInt, h: BigInt, i: BigInt): BigInt =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("b0") == r6(det0.toDouble / det.toDouble))
    assert(r.getAs[Double]("b1") == r6(det1.toDouble / det.toDouble))
    assert(r.getAs[Double]("b2") == r6(det2.toDouble / det.toDouble))
  }

  test("degenerate keys: collinear features, constant target, few points") {
    // x2 = 2·x1 → singular normal matrix → null coefficients
    val col2 = Seq(1L, 2L, 3L, 4L).map(x => ("k", x, 2 * x, x + 1))
      .toDF("k", "x1", "x2", "y")
    val rc = Regression.fit2(col2, Seq("k"), "x1", "x2", "y").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("b0")) &&
      rc.isNullAt(rc.fieldIndex("r2")))
    // constant y over independent features: perfect flat plane, r2 null
    val flat = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 5L))
      .map { case (a, b) => ("k", a, b, 7L) }.toDF("k", "x1", "x2", "y")
    val rf2 = Regression.fit2(flat, Seq("k"), "x1", "x2", "y").collect()(0)
    assert(rf2.getAs[Double]("b0") == 7.0 &&
      rf2.getAs[Double]("b1") == 0.0 && rf2.getAs[Double]("b2") == 0.0)
    assert(rf2.isNullAt(rf2.fieldIndex("r2")), "0/0 variance is null")
    // n < 3 → null
    val tiny = Seq(("k", 1L, 2L, 3L), ("k", 2L, 3L, 4L))
      .toDF("k", "x1", "x2", "y")
    assert(Regression.fit2(tiny, Seq("k"), "x1", "x2", "y")
      .collect()(0).isNullAt(2))
    // non-integer columns are a loud contract error
    intercept[IllegalArgumentException](Regression.fit2(
      Seq(("k", 1.0, 2L, 3L)).toDF("k", "x1", "x2", "y"),
      Seq("k"), "x1", "x2", "y"))
  }
}
