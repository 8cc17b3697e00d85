package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("twap: duration weighting beats the oversampled regime") {
    // value 10 holds for 9s (one observation), value 100 sampled 3x in
    // the last second: plain mean = 77.5, twap ≈ 10·9/11 + 100·2/11
    val d = Seq(
      ("k", ts(0), 10.0),
      ("k", ts(9), 100.0), ("k", ts(10), 100.0), ("k", ts(11), 100.0)
    ).toDF("k", "t", "v")
    val out = Timeseries.twap(d, Seq("k"), "t", "v").collect()(0)
    assert(out.getAs[Long]("n_segments") == 3L)
    assert(out.getAs[Long]("span_us") == 11000000L)
    val expected = math.floor(
      (10.0 * 9 + 100.0 * 1 + 100.0 * 1) / 11.0 * 1e6 + 0.5) / 1e6
    assert(out.getAs[Double]("twap") == expected)
    // single observation: no span, null twap — key absent from output
    // (no segments survive the lead filter)
    val single = Timeseries.twap(
      Seq(("a", ts(0), 5.0)).toDF("k", "t", "v"), Seq("k"), "t", "v")
    assert(single.count() == 0)
    intercept[IllegalArgumentException](
      Timeseries.twap(d, Seq.empty, "t", "v"))
    intercept[IllegalArgumentException](
      Timeseries.twap(d.withColumn("t", lit(1L)), Seq("k"), "t", "v"))
  }

  test("twap: simultaneous observations order by value deterministically") {
    // two values at t=5: the smaller gets the zero-length segment
    val d = Seq(
      ("k", ts(0), 10.0), ("k", ts(5), 30.0), ("k", ts(5), 20.0),
      ("k", ts(10), 40.0)
    ).toDF("k", "t", "v")
    val out = Timeseries.twap(d, Seq("k"), "t", "v").collect()(0)
    // segments: 10 for 5s, 20 for 0s, 30 for 5s -> (50+0+150)/10 = 20
    assert(out.getAs[Double]("twap") == 20.0)
  }

  test("vwap: hand-computed, zero-weight keys null, nulls dropped") {
    val d = Seq(
      ("a", 10.0, 1.0), ("a", 20.0, 3.0),        // (10+60)/4 = 17.5
      ("b", 5.0, 0.0),                            // zero weight -> null
      ("c", 7.0, 2.0)
    ).toDF("k", "p", "q")
    val out = Timeseries.vwap(d, Seq("k"), "p", "q")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("vwap") == 17.5)
    assert(out("a").getAs[Double]("total_weight") == 4.0)
    assert(out("b").isNullAt(out("b").fieldIndex("vwap")))
    assert(out("c").getAs[Double]("vwap") == 7.0)
    intercept[IllegalArgumentException](
      Timeseries.vwap(d, Seq.empty, "p", "q"))
  }
}
