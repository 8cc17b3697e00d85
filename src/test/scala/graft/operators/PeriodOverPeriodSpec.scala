package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PeriodOverPeriodSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("MoM and YoY values, deltas, and pct; gaps yield honest nulls") {
    val df = Seq(
      ("a", ts("2023-01-05"), 100.0), ("a", ts("2023-01-20"), 100.0),
      ("a", ts("2023-02-10"), 300.0),
      // March missing — April's prior must be NULL, not February
      ("a", ts("2023-04-01"), 500.0),
      ("a", ts("2024-01-15"), 260.0)) // YoY vs 2023-01
      .toDF("k", "t", "v")
    val got = Timeseries.periodOverPeriod(df, Seq("k"), "t", "v",
        grain = "month", seasonLag = 12)
      .orderBy("period_start").collect()
    def f(i: Int, c: String) = {
      val r = got(i); val j = r.fieldIndex(c)
      if (r.isNullAt(j)) None else Some(r.getDouble(j))
    }
    assert(got.length == 4)
    assert(f(0, "value").contains(200.0) && f(0, "prior_value").isEmpty)
    assert(f(1, "value").contains(300.0) && f(1, "prior_value").contains(200.0))
    assert(f(1, "delta").contains(100.0) && f(1, "pct_change").contains(0.5))
    assert(f(2, "prior_value").isEmpty, "gap must not borrow February")
    assert(f(3, "season_value").contains(200.0), "YoY reaches 2023-01")
    assert(f(3, "season_pct").contains(0.3))
    assert(f(3, "prior_value").isEmpty)
  }

  test("day grain compares adjacent days and same-weekday-last-week") {
    val df = Seq(
      ("k", ts("2024-03-01"), 10.0), ("k", ts("2024-03-02"), 15.0),
      ("k", ts("2024-03-08"), 30.0)) // 7 days after 03-01
      .toDF("k", "t", "v")
    val got = Timeseries.periodOverPeriod(df, Seq("k"), "t", "v",
        grain = "day", seasonLag = 7)
      .orderBy("period_start").collect()
    val last = got(2)
    assert(last.getDouble(last.fieldIndex("season_value")) == 10.0)
    assert(last.isNullAt(last.fieldIndex("prior_value")))
  }

  test("zero prior value yields null pct, not infinity") {
    val df = Seq(("k", ts("2024-01-01"), 0.0), ("k", ts("2024-02-01"), 5.0))
      .toDF("k", "t", "v")
    val got = Timeseries.periodOverPeriod(df, Seq("k"), "t", "v")
      .orderBy("period_start").collect()(1)
    assert(got.getDouble(got.fieldIndex("prior_value")) == 0.0)
    assert(got.isNullAt(got.fieldIndex("pct_change")))
  }

  test("keys never cross-compare; null timestamps excluded") {
    val df = Seq(
      (Some("a"), Some(ts("2024-01-01")), 1.0),
      (Some("b"), Some(ts("2024-02-01")), 9.0),
      (Some("a"), None, 99.0))
      .toDF("k", "t", "v")
    val got = Timeseries.periodOverPeriod(df, Seq("k"), "t", "v")
      .collect()
    assert(got.length == 2)
    assert(got.forall(r => r.isNullAt(r.fieldIndex("prior_value"))))
  }

  test("misuse is loud: bad grain, degenerate seasonLag") {
    val df = Seq(("k", ts("2024-01-01"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException](
      Timeseries.periodOverPeriod(df, Seq("k"), "t", "v", grain = "hour"))
    intercept[IllegalArgumentException](
      Timeseries.periodOverPeriod(df, Seq("k"), "t", "v", seasonLag = 1))
  }
}
