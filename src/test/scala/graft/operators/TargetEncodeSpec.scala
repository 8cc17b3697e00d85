package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-checked LOO + smoothing; singleton falls back to prior") {
    // cat a: ys 10, 20, 30 (sum 60); cat b: y 100 (singleton)
    // prior = 160/4 = 40, m = 2
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0)).toDF("id", "cat", "y")
    val out = TargetEncode.looEncode(df, "cat", "y", smoothing = 2.0)
      .select($"id", $"target_enc").as[(Long, Double)].collect().toMap
    def enc(looSum: Double, looN: Long) =
      r6((looSum + 2.0 * 40.0) / (looN + 2.0))
    assert(out(1L) == enc(50.0, 2)) // (20+30 + 80) / 4
    assert(out(2L) == enc(40.0, 2))
    assert(out(3L) == enc(30.0, 2))
    assert(out(4L) == enc(0.0, 0), "singleton encodes to the prior")
    assert(out(4L) == 40.0)
  }

  test("a row never sees its own label: leakage probe") {
    // two categories with IDENTICAL y multisets except one outlier —
    // the outlier's own encoding must not move with its own y
    val base = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "b", 5.0),
      (4L, "b", 5.0))
    val withOutlier = base :+ ((5L, "a", 1000.0))
    val e1 = TargetEncode.looEncode(
        base.toDF("id", "cat", "y") union Seq((5L, "a", 0.0))
          .toDF("id", "cat", "y"), "cat", "y", smoothing = 1.0)
      .where($"id" === 5L).select($"target_enc").as[Double].collect()(0)
    val e2 = TargetEncode.looEncode(
        withOutlier.toDF("id", "cat", "y"), "cat", "y", smoothing = 1.0)
      .where($"id" === 5L).select($"target_enc").as[Double].collect()(0)
    // the LOO numerator for row 5 is the same (5+5) in both runs; only
    // the PRIOR differs (through the global mean) — so the gap must be
    // exactly the smoothed-prior shift, not the raw 1000-vs-0 swing
    val prior1 = (5.0 * 4 + 0.0) / 5
    val prior2 = (5.0 * 4 + 1000.0) / 5
    assert(e1 == r6((10.0 + prior1) / 3.0))
    assert(e2 == r6((10.0 + prior2) / 3.0))
  }

  test("null labels carry no signal; guards") {
    val df = Seq((1L, "a", Some(10.0)), (2L, "a", None),
      (3L, "b", Some(30.0))).toDF("id", "cat", "y")
    val out = TargetEncode.looEncode(df, "cat", "y", smoothing = 1.0)
      .select($"id", $"target_enc").as[(Long, Double)].collect().toMap
    val prior = 20.0 // (10+30)/2 — null excluded
    // row 1: cat a's only OTHER labeled row is the null → LOO empty
    assert(out(1L) == r6((0.0 + prior) / 1.0))
    // row 2 (null y): LOO sum is the category's full labeled sum
    assert(out(2L) == r6((10.0 + prior) / 2.0))
    intercept[IllegalArgumentException](
      TargetEncode.looEncode(df, "cat", "y", smoothing = 0.0))
    // no labels at all → null encodings, not NaN
    val empty = TargetEncode.looEncode(
      Seq((1L, "a", Option.empty[Double])).toDF("id", "cat", "y"),
      "cat", "y")
    assert(empty.select($"target_enc").collect()(0).isNullAt(0))
  }
}
